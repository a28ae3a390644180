"""EDT with AdaptIR adapters, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference ``AdaptIR-main/net/edt.py``:

* ``CSwinTransformerBlock`` (:317-448): one qkv projection split into a
  horizontal-stripe half and a vertical-stripe half; each half runs windowed
  attention with rectangular windows (6x24 / 24x6), optional swin shift with
  a 0/-100 additive mask, and a depthwise-3x3 LePE positional term on v.
* ``SwinBody`` (:738-870): 6 RSTB stages of 6 blocks at embed_dim 180 over a
  48x48 token grid, final LN + 3x3 conv + long residual.
* ``EDT`` (:884-1070): per-task conv heads (SR: no downsampling; denoise and
  derain: 2x strided ResBlockDown stages with skips) and tails (SR:
  ResBlockSkip + pixel-shuffle Upsample + conv over bilinear-upsampled input
  residual; dn/dr: transposed-conv UpResBlocks), DIV2K mean shift.
* ``AdaptIR`` (:1129-1215): same tri-branch adapter as the IPT variant but
  hidden = dim//14 and channel gate reduction //4 — parallel to each MLP.

Window masks are computed statically (numpy) from the traced spatial shape.
The torch eval path (:1073-1085) reflect-pads to a window multiple and crops
— provided here by the same logic in ``forward`` when sizes are ragged.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, conv2d, gelu_exact
from image_restoration_tpu.ops.layernorm import BatchNorm2d, WithBiasLayerNorm
from image_restoration_tpu.ops.resample import pixel_shuffle, resize_bilinear

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def _win_hw(window_size, index):
    return (window_size[0], window_size[1]) if index == 0 else (
        window_size[1], window_size[0])


def _window_partition(x, hs, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // hs, hs, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs, ws, c)


def _window_reverse(win, hs, ws, h, w):
    b = win.shape[0] // ((h // hs) * (w // ws))
    x = win.reshape(b, h // hs, w // ws, hs, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _swin_mask(h, w, hs, ws, sh, sw):
    """0/-100 additive mask for shifted windows (edt.py:374-405), numpy."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hsl in (slice(0, -hs), slice(-hs, -sh), slice(-sh, None)):
        for wsl in (slice(0, -ws), slice(-ws, -sw), slice(-sw, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    m = img.reshape(h // hs, hs, w // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, hs * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """edt.py:232-297: rectangular-window attention + LePE."""

    dim: int  # half dim
    num_heads: int
    window_size: Sequence[int]
    index: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask):
        b, h, w, c = v.shape
        hs, ws = _win_hw(self.window_size, self.index)
        heads, ch = self.num_heads, c // self.num_heads
        n = hs * ws

        def to_heads(t):
            t = _window_partition(t, hs, ws).reshape(-1, n, heads, ch)
            return t.transpose(0, 2, 1, 3)  # (B_, heads, N, ch)

        # torch orders head split as (heads, ch) over the channel axis of the
        # window (edt.py:268) — matches reshape(n, heads, ch)? No: it views
        # (H_w, W_w, heads, ch) then flattens (H_w*W_w); same as here.
        qh, kh = to_heads(q), to_heads(k)
        vw = _window_partition(v, hs, ws)
        lepe = Conv(c, 3, padding=1, groups=c, use_bias=True, name="lepe",
                    dtype=self.dtype, param_dtype=self.param_dtype)(vw)
        vh = vw.reshape(-1, n, heads, ch).transpose(0, 2, 1, 3)
        lh = lepe.reshape(-1, n, heads, ch).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnc,bhmc->bhnm", qh * (ch ** -0.5), kh,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, heads, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, vh,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out + lh
        out = out.transpose(0, 2, 1, 3).reshape(-1, hs, ws, c)
        return _window_reverse(out, hs, ws, h, w)


class AdaptIRAdapter(nn.Module):
    """edt.py:1129-1215 (hidden = dim//14, channel gate //4); NHWC input."""

    d_model: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xi, train: bool = False):
        b, h, w, _ = xi.shape
        hidden = self.d_model // 14
        rank = hidden // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        xi = Conv(hidden, 1, use_bias=True, name="head", **kw)(xi)
        xi = BatchNorm2d(name="BN", **kw)(xi, train=train)

        xf = jnp.fft.rfft2(xi.astype(jnp.float32), axes=(1, 2), norm="ortho")
        mag, pha = jnp.abs(xf), jnp.angle(xf)
        amp_w = self.param("amp_fuse_weight", nn.initializers.ones,
                           (hidden,), self.param_dtype)
        amp_b = self.param("amp_fuse_bias", nn.initializers.zeros,
                           (hidden,), self.param_dtype)
        pha_w = self.param("pha_fuse_weight", nn.initializers.ones,
                           (hidden,), self.param_dtype)
        pha_b = self.param("pha_fuse_bias", nn.initializers.zeros,
                           (hidden,), self.param_dtype)
        mag = mag * amp_w + amp_b
        pha = pha * pha_w + pha_b
        gx = mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))
        global_x = jnp.abs(
            jnp.fft.irfft2(gx, s=(h, w), axes=(1, 2), norm="ortho")
        ).astype(xi.dtype)

        def kaiming(key, shape, dtype=jnp.float32):
            bound = math.sqrt(6.0 / ((1 + 5.0) * shape[1]))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        wa = self.param("conv_weight_A", kaiming, (hidden, rank), self.param_dtype)
        wb = self.param("conv_weight_B", kaiming, (rank, 9), self.param_dtype)
        cb = self.param("conv_bias", nn.initializers.zeros, (hidden,),
                        self.param_dtype)
        wk = (wa @ wb).reshape(hidden, 1, 3, 3).transpose(2, 3, 1, 0)
        local_x = conv2d(xi, wk.astype(xi.dtype), bias=cb.astype(xi.dtype),
                         padding=1, groups=hidden)

        l = h * w
        score = Conv(1, 1, use_bias=True, name="compress", **kw)(xi)
        score = jax.nn.softmax(score.reshape(b, l, 1), axis=1)
        pooled = jnp.einsum("blc,blo->bc", xi.reshape(b, l, hidden), score)
        pooled = nn.Dense(hidden // 2, name="proj_0", **kw)(pooled)
        pooled = nn.Dense(hidden, name="proj_2", **kw)(gelu_exact(pooled))
        channel_score = pooled[:, None, None, :]

        cg = jnp.mean(global_x, axis=(1, 2), keepdims=True)
        cg = Conv(hidden // 4, 1, use_bias=True,
                  name="channel_interaction_1", **kw)(cg)
        cg = Conv(hidden, 1, use_bias=True, name="channel_interaction_3",
                  **kw)(gelu_exact(cg))
        channel_gate = jax.nn.sigmoid(cg)
        spatial_gate = jax.nn.sigmoid(
            Conv(1, 1, use_bias=True, name="spatial_interaction", **kw)(local_x))
        spatial_x = channel_gate * local_x + spatial_gate * global_x

        return nn.Conv(self.d_model, (1, 1), use_bias=False,
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="tail")(channel_score * spatial_x)


class CSwinBlock(nn.Module):
    """edt.py:317-448."""

    dim: int
    num_heads: int
    window_size: Sequence[int] = (6, 24)
    shifted: bool = False
    mlp_ratio: float = 2.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        b, l, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        half = c // 2
        xi = x.reshape(b, h, w, c)
        shortcut = xi
        xn = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm1")(xi)
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv", **kw)(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        outs = []
        for idx in range(2):
            sl = slice(0, half) if idx == 0 else slice(half, None)
            qi, ki, vi = q[..., sl], k[..., sl], v[..., sl]
            hs, ws = _win_hw(self.window_size, idx)
            if self.shifted:
                sh, sw = self.window_size[0] // 2, self.window_size[1] // 2
                if idx == 1:
                    sh, sw = sw, sh
                qi = jnp.roll(qi, (-sh, -sw), axis=(1, 2))
                ki = jnp.roll(ki, (-sh, -sw), axis=(1, 2))
                vi = jnp.roll(vi, (-sh, -sw), axis=(1, 2))
                mask = jnp.asarray(_swin_mask(h, w, hs, ws, sh, sw))
            else:
                mask = None
            o = WindowAttention(half, self.num_heads, self.window_size, idx,
                                name=f"attns_{idx}", **kw)(qi, ki, vi, mask)
            if self.shifted:
                o = jnp.roll(o, (sh, sw), axis=(1, 2))
            outs.append(o)
        attn = jnp.concatenate(outs, axis=-1)
        attn = nn.Dense(c, use_bias=True, name="proj", **kw)(attn)
        xi = shortcut + attn

        shortcut = xi
        xn = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm2")(xi)
        adapt = AdaptIRAdapter(self.dim, name="adaptir", **kw)(xn, train=train)
        # Mlp (edt.py:159-179): fc1 -> gelu -> dw5x5 -> gelu -> fc2
        hdn = int(self.dim * self.mlp_ratio)
        m = nn.Dense(hdn, name="mlp_fc1", **kw)(xn)
        m = gelu_exact(m)
        m = Conv(hdn, 5, padding=2, groups=hdn, use_bias=True,
                 name="mlp_dwconv", **kw)(m)
        m = gelu_exact(m)
        m = nn.Dense(self.dim, name="mlp_fc2", **kw)(m)
        xi = shortcut + m + adapt
        return xi.reshape(b, l, c)


class SwinBody(nn.Module):
    """edt.py:738-870: RSTB stages + final LN + conv + residual."""

    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: Sequence[int] = (6, 24)
    mlp_ratio: float = 2.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = WithBiasLayerNorm(param_dtype=self.param_dtype,
                              name="patch_embed_norm")(t)
        for li, depth in enumerate(self.depths):
            res = t
            for bi in range(depth):
                t = CSwinBlock(self.embed_dim, self.num_heads[li],
                               self.window_size, shifted=(bi % 2 == 1),
                               mlp_ratio=self.mlp_ratio,
                               name=f"layers_{li}_blocks_{bi}",
                               **kw)(t, h, w, train=train)
            t = t + res
        t = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(t)
        feat = t.reshape(b, h, w, c)
        feat = Conv(self.embed_dim, 3, padding=1, use_bias=True,
                    name="conv_after_body", **kw)(feat)
        return feat + x


class ResBlockDown(nn.Module):
    """edt.py:38-64."""

    in_chl: int
    out_chl: int
    down: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        identity = Conv(self.out_chl, 1, use_bias=True, name="shortcut", **kw)(x)
        h = nn.leaky_relu(Conv(self.in_chl, 3, padding=1, use_bias=True,
                               name="conv_1", **kw)(x), 0.2)
        h = nn.leaky_relu(Conv(self.out_chl, 3, padding=1, use_bias=True,
                               name="conv_2", **kw)(h), 0.2)
        h = h + identity
        if self.down:
            hd = Conv(self.out_chl, 4, stride=2, padding=1, use_bias=False,
                      name="conv_down", **kw)(h)
            return hd, h
        return h


class ResBlockUp(nn.Module):
    """edt.py:79-97."""

    out_chl: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        identity = Conv(self.out_chl, 1, use_bias=True, name="shortcut", **kw)(x)
        h = nn.leaky_relu(Conv(self.out_chl, 3, padding=1, use_bias=True,
                               name="conv_1", **kw)(x), 0.2)
        h = nn.leaky_relu(Conv(self.out_chl, 3, padding=1, use_bias=True,
                               name="conv_2", **kw)(h), 0.2)
        return h + identity


class ConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(k=2, s=2) — kernel stored (k, k, O, I) like the
    importer's OIHW->HWIO transpose of torch's (I, O, k, k)."""

    out_chl: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (2, 2, self.out_chl, cin), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_chl,),
                          self.param_dtype)
        dt = x.dtype if self.dtype is None else self.dtype
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (2, 2, cin, self.out_chl), ("NHWC", "HWIO", "NHWC"))
        kflip = kern[::-1, ::-1].astype(dt)  # transposed conv = flipped kernel
        return jax.lax.conv_general_dilated(
            x.astype(dt), jnp.transpose(kflip, (0, 1, 3, 2)),
            (1, 1), [(1, 1), (1, 1)], lhs_dilation=(2, 2),
            dimension_numbers=dn) + bias.astype(dt)


class UpResBlock(nn.Module):
    """Transposed-conv 2x up + skip-concat ResBlockUp (edt.py:109-123)."""

    out_chl: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        up = ConvTranspose2x(self.out_chl, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="up")(x)
        h = jnp.concatenate([up, skip], axis=-1)
        return ResBlockUp(self.out_chl, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="block")(h)


class ResBlockSkip(nn.Module):
    """conv + skip-concat ResBlockUp (edt.py:134-148)."""

    out_chl: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Conv(self.out_chl, 3, padding=1, use_bias=True, name="conv", **kw)(x)
        h = jnp.concatenate([h, skip], axis=-1)
        return ResBlockUp(self.out_chl, name="block", **kw)(h)


@register_model("edt_adaptir")
@register_model("edt")
class EDT(nn.Module):
    """edt.py:884-1070, single-task configuration via ``de_type``."""

    de_type: str = "sr_2"
    num_feat: int = 32
    embed_dim: int = 180
    depth: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        nf, ed, d = self.num_feat, self.embed_dim, self.depth
        is_sr = "sr" in self.de_type
        if is_sr:
            scale = int(self.de_type.split("_")[-1])
            hname = f"head_sr_x{scale}"
            tname = f"tail_sr_x{scale}"
        elif "denoise" in self.de_type:
            nl = int(self.de_type.split("_")[-1])
            hname, tname, scale = f"head_dn_g{nl}", f"tail_dn_g{nl}", 1
        else:
            hname, tname, scale = "head_dr_H", "tail_dr_H", 1

        mean = jnp.asarray(RGB_MEAN, x.dtype)
        x_inp = x - mean

        # head (edt.py:991-1029)
        h = Conv(nf, 3, padding=1, use_bias=True, name=f"{hname}_0", **kw)(x_inp)
        skips = []
        for i in range(d):
            blk = ResBlockDown(nf * 2 ** i, nf * 2 ** (i + 1), down=not is_sr,
                               name=f"{hname}_{i + 1}", **kw)
            if is_sr:
                h = blk(h)
                skips.append(h)
            else:
                h, x_up = blk(h)
                skips.append(x_up)
        h = Conv(ed, 3, padding=1, use_bias=True, name=f"{hname}_{d + 1}", **kw)(h)

        # body
        h = SwinBody(ed, name="body", **kw)(h, train=train)

        # tail (edt.py:1036-1066)
        t = h
        for j, i in enumerate(reversed(range(d))):
            out_chl = nf * 2 ** (i + 1)
            if is_sr:
                t = ResBlockSkip(out_chl, name=f"{tname}_{j}", **kw)(
                    t, skips[-j - 1])
            else:
                t = UpResBlock(out_chl, name=f"{tname}_{j}", **kw)(
                    t, skips[-j - 1])
        if is_sr:
            up = 0
            if scale in (2, 4):
                for _ in range(int(math.log2(scale))):
                    t = Conv(4 * out_chl, 3, padding=1, use_bias=True,
                             name=f"{tname}_{d}_{up}", **kw)(t)
                    t = pixel_shuffle(t, 2)
                    up += 2
            elif scale == 3:
                t = Conv(9 * out_chl, 3, padding=1, use_bias=True,
                         name=f"{tname}_{d}_0", **kw)(t)
                t = pixel_shuffle(t, 3)
            t = Conv(3, 3, padding=1, use_bias=True,
                     name=f"{tname}_{d + 1}", **kw)(t)
            b, hh, ww, _ = x_inp.shape
            lq_up = resize_bilinear(x_inp, hh * scale, ww * scale)
            out = lq_up + t
        else:
            out = x_inp + Conv(3, 3, padding=1, use_bias=True,
                               name=f"{tname}_{d}", **kw)(t)
        return (out + mean).astype(jnp.float32)


def edt_key_map(key: str):
    """Flatten torch EDT keys onto the flax tree."""
    if key == "mean":
        return None
    if "attn_mask" in key:
        return None
    key = key.replace("body.patch_embed.norm.", "body.patch_embed_norm.")
    key = key.replace(".residual_group.blocks.", ".blocks.")
    key = key.replace("body.layers.", "body.layers_")
    # body.layers_N.blocks.M -> body.layers_N_blocks_M
    import re

    key = re.sub(r"(body\.layers_\d+)\.blocks\.(\d+)\.", r"\1_blocks_\2.", key)
    key = key.replace(".mlp.fc1.", ".mlp_fc1.")
    key = key.replace(".mlp.fc2.", ".mlp_fc2.")
    key = key.replace(".mlp.dwconv.", ".mlp_dwconv.")
    key = key.replace(".amp_fuse.weight", ".amp_fuse_weight")
    key = key.replace(".amp_fuse.bias", ".amp_fuse_bias")
    key = key.replace(".pha_fuse.weight", ".pha_fuse_weight")
    key = key.replace(".pha_fuse.bias", ".pha_fuse_bias")
    key = key.replace(".channel_interaction.1.", ".channel_interaction_1.")
    key = key.replace(".channel_interaction.3.", ".channel_interaction_3.")
    key = key.replace(".proj.0.", ".proj_0.")
    key = key.replace(".proj.2.", ".proj_2.")
    return key
