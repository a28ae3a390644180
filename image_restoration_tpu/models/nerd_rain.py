"""NeRD-Rain (CVPR'24) MultiscaleNet, TPU-native (reference
NeRD-Rain-main/{model.py,mlp.py,layers.py}).

Three coarse-to-fine Restormer-style U-Nets (small / mid / max, separate
weights; the max branch runs three sequential U-Net passes with context
convs between them), an INR RGB head between scales (see ops/inr.py for the
degeneracy analysis), and SKFF-style bidirectional fusion of latents with
downscaled exchange (model.py:203-232 Fusion, :514-520 BFF wiring). Returns
7 outputs ordered max->...->small like the reference's outputs[::-1].
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.models.restormer import BlockStackMixin
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.inr import INR
from image_restoration_tpu.ops.resample import Downsample, Upsample


def _interp(x, scale):
    """F.interpolate(scale_factor=s) default NEAREST mode."""
    b, h, w, c = x.shape
    nh, nw = int(h * scale), int(w * scale)
    idx_h = (jnp.arange(nh) / scale).astype(jnp.int32)
    idx_w = (jnp.arange(nw) / scale).astype(jnp.int32)
    return x[:, idx_h][:, :, idx_w]


class Fusion(nn.Module):
    """SKFF-style gated fusion (model.py:203-232)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xq = Conv(self.dim, 3, padding=1, use_bias=True, name="query_conv", **kw)(x)
        yk = Conv(self.dim, 3, padding=1, use_bias=True, name="key_conv", **kw)(y)
        attn = jax.nn.sigmoid(xq * yk)
        ax, ay = x * attn, y * attn
        gx = Conv(2, 3, padding=1, use_bias=True, name="gamma1", **kw)(
            jnp.concatenate([x, ax], axis=-1))
        x_out = x * gx[..., 0:1] + ax * gx[..., 1:2]
        gy = Conv(2, 3, padding=1, use_bias=True, name="gamma2", **kw)(
            jnp.concatenate([y, ay], axis=-1))
        y_out = y * gy[..., 0:1] + ay * gy[..., 1:2]
        return x_out + y_out


@register_model("nerd_rain")
class MultiscaleNet(BlockStackMixin, nn.Module):
    """model.py:234-631 (large variant).

    Serving fast paths (BlockStackMixin): every stack here is a run of
    Restormer TransformerBlocks, so ``fused_block`` (whole-block 2-pass
    canvas kernel) and ``scan_blocks`` (per-stack nn.scan; use
    restormer.stack_scan_params to convert imported loop-layout trees)
    apply to all three branches unchanged."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (2, 3, 3)
    heads: Sequence[int] = (1, 2, 4)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fold_dwconv: bool = False
    fused_gdfn: bool = False
    fused_attn: bool = False
    fused_block: bool = False
    scan_blocks: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _stack(self, x, d, h, n, name):
        return self._run_level(x, (d, h, n, name))

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        nb, hd = self.num_blocks, self.heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = lambda f, name, k=3, p=1: Conv(f, k, padding=p, use_bias=self.use_bias,
                                              name=name, **kw)
        bconv = lambda f, name, k=3, p=1: Conv(f, k, padding=p, use_bias=True,
                                               name=name, **kw)
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img
        outputs = []

        img_max = x
        img_mid = _interp(x, 0.5)  # F.interpolate default = nearest
        img_small = _interp(x, 0.25)

        # ---- small branch encoder
        e1s = conv(d, "patch_embed_small")(img_small)
        e1s = self._stack(e1s, d, hd[0], nb[0], "encoder_level1_small")
        e2s = Downsample(d, name="down1_2_small", **kw)(e1s)
        e2s = self._stack(e2s, d * 2, hd[1], nb[1], "encoder_level2_small")
        lat_s = Downsample(d * 2, name="down2_3_small", **kw)(e2s)
        lat_s = self._stack(lat_s, d * 4, hd[2], nb[2], "latent_small")
        lat_s_mid = Upsample(d * 4, name="upsmall2mid1", **kw)(lat_s)
        lat_s_mid = Upsample(d * 2, name="upsmall2mid2", **kw)(lat_s_mid)

        outputs.append(img_small.astype(jnp.float32))
        inr1 = INR(d, name="INR", **kw)(lat_s_mid)
        img_small_ = inr1 + img_small
        outputs.append(img_small_.astype(jnp.float32))
        mid_img = img_mid + _interp(img_small_, 2)

        # ---- mid branch first pass
        e1m = conv(d, "patch_embed_mid")(mid_img)
        e1m = self._stack(e1m, d, hd[0], nb[0], "encoder_level1_mid1")
        e2m = Downsample(d, name="down1_2_mid", **kw)(e1m)
        e2m = self._stack(e2m, d * 2, hd[1], nb[1], "encoder_level2_mid1")
        lat_m = Downsample(d * 2, name="down2_3_mid", **kw)(e2m)
        lat_m = self._stack(lat_m, d * 4, hd[2], nb[2], "latent_mid1")
        lat_m_max = Upsample(d * 4, name="upmid2max1", **kw)(lat_m)
        lat_m_max = Upsample(d * 2, name="upmid2max2", **kw)(lat_m_max)

        outputs.append((mid_img / 2).astype(jnp.float32))
        inr2 = INR(d, name="INR2", **kw)(lat_m_max)
        mid_img_ = inr2 + mid_img
        outputs.append(mid_img_.astype(jnp.float32))
        max_img = img_max + _interp(mid_img_, 2)

        # ---- max branch: three chained U-Net passes
        e1x = conv(d, "patch_embed_max")(max_img)
        e1x = self._stack(e1x, d, hd[0], nb[0], "encoder_level1_max1")
        e2x = Downsample(d, name="down1_2_max", **kw)(e1x)
        e2x = self._stack(e2x, d * 2, hd[1], nb[1], "encoder_level2_max1")
        lat_x = Downsample(d * 2, name="down2_3_max", **kw)(e2x)
        lat_x = self._stack(lat_x, d * 4, hd[2], nb[2], "latent_max1")
        bff_max_1 = lat_x

        dx = Upsample(d * 4, name="up3_2_max", **kw)(lat_x)
        dx = conv(d * 2, "reduce_chan_level2_max1", 1, 0)(jnp.concatenate([dx, e2x], -1))
        dx = self._stack(dx, d * 2, hd[1], nb[1], "decoder_level2_max1")
        dx = Upsample(d * 2, name="up2_1_max", **kw)(dx)
        dx = conv(d, "reduce_chan_level1_max1", 1, 0)(jnp.concatenate([dx, e1x], -1))
        dx = self._stack(dx, d, hd[0], nb[0], "decoder_level1_max1")
        dx = conv(d, "output_max_context1")(dx)

        e1x = self._stack(dx, d, hd[0], nb[0], "encoder_level1_max2")
        e2x = Downsample(d, name="down1_2_max2", **kw)(e1x)
        e2x = self._stack(e2x, d * 2, hd[1], nb[1], "encoder_level2_max2")
        lat_x = Downsample(d * 2, name="down2_3_max2", **kw)(e2x)
        lat_x = self._stack(lat_x, d * 4, hd[2], nb[2], "latent_max2")
        bff_max_2 = lat_x

        dx = Upsample(d * 4, name="up3_2_max2", **kw)(lat_x)
        dx = conv(d * 2, "reduce_chan_level2_max2", 1, 0)(jnp.concatenate([dx, e2x], -1))
        dx = self._stack(dx, d * 2, hd[1], nb[1], "decoder_level2_max2")
        dx = Upsample(d * 2, name="up2_1_max2", **kw)(dx)
        # single instance: the reference REUSES these weights in the third
        # decoder pass (model.py:598; reduce_chan_level1_max3 is dead)
        red1_max2 = Conv(d, 1, padding=0, use_bias=self.use_bias,
                         name="reduce_chan_level1_max2", **kw)
        dx = red1_max2(jnp.concatenate([dx, e1x], -1))
        dx = self._stack(dx, d, hd[0], nb[0], "decoder_level1_max2")
        dx = conv(d, "output_max_context2")(dx)

        e1x = self._stack(dx, d, hd[0], nb[0], "encoder_level1_max3")
        e2x = Downsample(d, name="down1_2_max3", **kw)(e1x)
        e2x = self._stack(e2x, d * 2, hd[1], nb[1], "encoder_level2_max3")
        lat_x = Downsample(d * 2, name="down2_3_max3", **kw)(e2x)
        lat_x = self._stack(lat_x, d * 4, hd[2], nb[2], "latent_max3")

        bff1 = _interp(Fusion(d * 4, name="BF1", **kw)(bff_max_1, bff_max_2), 0.5)
        bff2 = _interp(Fusion(d * 4, name="BF2", **kw)(bff_max_2, lat_x), 0.5)

        dx_dec2 = Upsample(d * 4, name="up3_2_max3", **kw)(lat_x)

        # ---- mid branch second pass with cross-scale fusion
        bff3_1 = lat_m
        lat_m = lat_m + bff1
        dm = Upsample(d * 4, name="up3_2_mid", **kw)(lat_m)
        dm = conv(d * 2, "reduce_chan_level2_mid1", 1, 0)(jnp.concatenate([dm, e2m], -1))
        dm = self._stack(dm, d * 2, hd[1], nb[1], "decoder_level2_mid1")
        dm = Upsample(d * 2, name="up2_1_mid", **kw)(dm)
        dm = conv(d, "reduce_chan_level1_mid1", 1, 0)(jnp.concatenate([dm, e1m], -1))
        dm = self._stack(dm, d, hd[0], nb[0], "decoder_level1_mid1")
        dm = conv(d, "output_mid_context")(dm)

        e1m = self._stack(dm, d, hd[0], nb[0], "encoder_level1_mid2")
        e2m = Downsample(d, name="down1_2_mid2", **kw)(e1m)
        e2m = self._stack(e2m, d * 2, hd[1], nb[1], "encoder_level2_mid2")
        lat_m = Downsample(d * 2, name="down2_3_mid2", **kw)(e2m)
        lat_m = self._stack(lat_m, d * 4, hd[2], nb[2], "latent_mid2")
        bff3 = _interp(Fusion(d * 4, name="BF3", **kw)(bff3_1, lat_m), 0.5)
        lat_m = lat_m + bff2
        dm_dec2 = Upsample(d * 4, name="up3_2_mid2", **kw)(lat_m)

        # ---- small decoder with fused latent
        lat_s = lat_s + bff3
        ds = Upsample(d * 4, name="up3_2_small", **kw)(lat_s)
        ds = conv(d * 2, "reduce_chan_level2_small", 1, 0)(jnp.concatenate([ds, e2s], -1))
        ds = self._stack(ds, d * 2, hd[1], nb[1], "decoder_level2_small")
        ds = Upsample(d * 2, name="up2_1_small", **kw)(ds)
        ds = conv(d, "reduce_chan_level1_small", 1, 0)(jnp.concatenate([ds, e1s], -1))
        ds = self._stack(ds, d, hd[0], nb[0], "decoder_level1_small")
        small_2_mid = ds
        out_small = conv(self.out_channels, "output_small")(ds) + img_small
        outputs.append(out_small.astype(jnp.float32))

        # ---- mid decoder second half
        dm = conv(d * 2, "reduce_chan_level2_mid2", 1, 0)(
            jnp.concatenate([dm_dec2, e2m], -1))
        dm = self._stack(dm, d * 2, hd[1], nb[1], "decoder_level2_mid2")
        dm = Upsample(d * 2, name="up2_1_mid2", **kw)(dm)
        dm = conv(d, "reduce_chan_level1_mid2", 1, 0)(jnp.concatenate([dm, e1m], -1))
        dm = self._stack(dm, d, hd[0], nb[0], "decoder_level1_mid2")
        dm = dm + _interp(small_2_mid, 2)
        mid_2_max = dm
        out_mid = conv(self.out_channels, "output_mid")(dm) + img_mid
        outputs.append(out_mid.astype(jnp.float32))

        # ---- max decoder third pass
        dx = conv(d * 2, "reduce_chan_level2_max3", 1, 0)(
            jnp.concatenate([dx_dec2, e2x], -1))
        dx = self._stack(dx, d * 2, hd[1], nb[1], "decoder_level2_max3")
        dx = Upsample(d * 2, name="up2_1_max3", **kw)(dx)
        dx = red1_max2(jnp.concatenate([dx, e1x], -1))  # reuse (model.py:598)
        dx = self._stack(dx, d, hd[0], nb[0], "decoder_level1_max3")
        dx = dx + _interp(mid_2_max, 2)
        out_max = conv(self.out_channels, "output_max")(dx) + img_max
        outputs.append(out_max.astype(jnp.float32))

        return tuple(outputs[::-1])


def nerd_rain_key_map(key: str):
    """reduce_chan_level1_max3 is defined but never used (the reference
    reuses _max2's weights at model.py:598); drop its checkpoint keys."""
    if key.startswith("reduce_chan_level1_max3"):
        return None
    return key
