"""Restormer, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference `Restormer.py:193-283`
(4-level U-Net transformer: MDTA + GDFN blocks, pixel-shuffle resamplers,
encoder-skip concat with 1x1 reduce at levels 3/2, plain concat at level 1,
refinement blocks, residual-to-input head, optional dual-pixel skip path).

Module names mirror the torch attribute paths so the checkpoint importer
(utils/torch_import.py) can map `encoder_level1.0.attn.qkv.weight` ->
params['encoder_level1_0']['attn']['qkv']['conv']['kernel'] mechanically.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from image_restoration_tpu.ops.attention import MDTA
from image_restoration_tpu.ops.common import Conv, ConvParams
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class _LNLeaf(nn.Module):
    """Param twin of {BiasFree,WithBias}LayerNorm's 'body'."""

    with_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
             if self.with_bias else None)
        return w, b


class _LNParams(nn.Module):
    ln_type: str
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        return _LNLeaf(self.ln_type != "BiasFree", self.param_dtype,
                       name="body")(c)


class _GDFNParams(nn.Module):
    """Param twin of GDFN (project_in / dwconv / project_out)."""

    dim: int
    expansion: float
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        hidden = int(self.dim * self.expansion)
        w_in, b_in = ConvParams(hidden * 2, self.dim, 1, self.use_bias,
                                self.param_dtype, name="project_in")()
        w_dw, b_dw = ConvParams(hidden * 2, 1, 3, self.use_bias,
                                self.param_dtype, name="dwconv")()
        w_out, b_out = ConvParams(self.dim, hidden, 1, self.use_bias,
                                  self.param_dtype, name="project_out")()
        return w_in, b_in, w_dw, b_dw, w_out, b_out


class TransformerBlock(nn.Module):
    """LN -> MDTA -> +res; LN -> GDFN -> +res (Restormer.py:137-150)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fold_dwconv: bool = False
    fused_gdfn: bool = False  # Pallas fused LN+GDFN tail (kernels/gdfn_pallas)
    fused_attn: bool = False  # Pallas fused LN+qkv+dwconv (kernels/mdta_pallas)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_attn:
            from image_restoration_tpu.kernels.attn_core_pallas import (
                fused_mdta_core,
            )
            from image_restoration_tpu.kernels.mdta_pallas import (
                fused_ln_qkv_dwconv_split,
            )

            d = self.dim
            lnw, lnb = _LNParams(self.ln_type, self.param_dtype,
                                 name="norm1")(d)

            class _AttnParams(nn.Module):
                use_bias: bool
                param_dtype: Any = jnp.float32

                @nn.compact
                def __call__(self2):
                    temp = self2.param("temperature", nn.initializers.ones,
                                       (self.num_heads, 1, 1),
                                       self2.param_dtype)
                    wq, bq = ConvParams(3 * d, d, 1, self2.use_bias,
                                        self2.param_dtype, name="qkv")()
                    wd, bd = ConvParams(3 * d, 1, 3, self2.use_bias,
                                        self2.param_dtype,
                                        name="qkv_dwconv")()
                    wo, bo = ConvParams(d, d, 1, self2.use_bias,
                                        self2.param_dtype,
                                        name="project_out")()
                    return temp, wq, bq, wd, bd, wo, bo

            temp, wq, bq, wd, bd, wo, bo = _AttnParams(
                self.use_bias, self.param_dtype, name="attn")()
            qkv = fused_ln_qkv_dwconv_split(x, (lnw, lnb, wq, bq, wd, bd),
                                            self.ln_type)
            x = fused_mdta_core(qkv, x, temp, wo, bo, self.num_heads)
        else:
            x = x + MDTA(self.dim, self.num_heads, self.use_bias,
                         fold_dwconv=self.fold_dwconv, name="attn", **kw)(
                LayerNorm(self.ln_type, param_dtype=self.param_dtype,
                          name="norm1")(x)
            )
        if self.fused_gdfn:
            from image_restoration_tpu.kernels.gdfn_pallas import fused_ln_gdfn

            lnw, lnb = _LNParams(self.ln_type, self.param_dtype,
                                 name="norm2")(self.dim)
            gp = _GDFNParams(self.dim, self.expansion, self.use_bias,
                             self.param_dtype, name="ffn")()
            w_in, b_in, w_dw, b_dw, w_out, b_out = gp
            x = fused_ln_gdfn(
                x, (lnw, lnb, w_in, b_in, w_dw, b_dw, w_out, b_out),
                self.ln_type)
        else:
            x = x + GDFN(self.dim, self.expansion, self.use_bias,
                         fold_dwconv=self.fold_dwconv, name="ffn", **kw)(
                LayerNorm(self.ln_type, param_dtype=self.param_dtype,
                          name="norm2")(x)
            )
        return x


from image_restoration_tpu.models.registry import register_model


@register_model("restormer")
class Restormer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    fold_dwconv: bool = False  # alternative dense-3x3 folded qkv/FFN convs
    fused_gdfn: bool = False   # Pallas fused LN+GDFN (TPU serving fast path)
    fused_attn: bool = False   # Pallas fused LN+qkv+dwconv front
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _blocks(self, dim, heads, n, prefix):
        return [
            TransformerBlock(
                dim=dim, num_heads=heads, expansion=self.ffn_expansion_factor,
                use_bias=self.use_bias, ln_type=self.ln_type,
                fold_dwconv=self.fold_dwconv and dim <= 96,
                fused_gdfn=self.fused_gdfn, fused_attn=self.fused_attn,
                dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"{prefix}_{i}",
            )
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img

        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        enc1 = feats
        for blk in self._blocks(d, self.heads[0], self.num_blocks[0], "encoder_level1"):
            enc1 = blk(enc1)

        x2 = Downsample(d, name="down1_2", **kw)(enc1)
        enc2 = x2
        for blk in self._blocks(d * 2, self.heads[1], self.num_blocks[1], "encoder_level2"):
            enc2 = blk(enc2)

        x3 = Downsample(d * 2, name="down2_3", **kw)(enc2)
        enc3 = x3
        for blk in self._blocks(d * 4, self.heads[2], self.num_blocks[2], "encoder_level3"):
            enc3 = blk(enc3)

        x4 = Downsample(d * 4, name="down3_4", **kw)(enc3)
        latent = x4
        for blk in self._blocks(d * 8, self.heads[3], self.num_blocks[3], "latent"):
            latent = blk(latent)

        dec3 = Upsample(d * 8, name="up4_3", **kw)(latent)
        dec3 = jnp.concatenate([dec3, enc3], axis=-1)
        dec3 = Conv(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3", **kw)(dec3)
        for blk in self._blocks(d * 4, self.heads[2], self.num_blocks[2], "decoder_level3"):
            dec3 = blk(dec3)

        dec2 = Upsample(d * 4, name="up3_2", **kw)(dec3)
        dec2 = jnp.concatenate([dec2, enc2], axis=-1)
        dec2 = Conv(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2", **kw)(dec2)
        for blk in self._blocks(d * 2, self.heads[1], self.num_blocks[1], "decoder_level2"):
            dec2 = blk(dec2)

        dec1 = Upsample(d * 2, name="up2_1", **kw)(dec2)
        dec1 = jnp.concatenate([dec1, enc1], axis=-1)  # stays at 2*dim: no reduce
        for blk in self._blocks(d * 2, self.heads[0], self.num_blocks[0], "decoder_level1"):
            dec1 = blk(dec1)
        for blk in self._blocks(d * 2, self.heads[0], self.num_refinement_blocks, "refinement"):
            dec1 = blk(dec1)

        if self.dual_pixel_task:
            dec1 = dec1 + Conv(d * 2, 1, use_bias=self.use_bias, name="skip_conv", **kw)(feats)
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1)
        else:
            out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                       name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)
