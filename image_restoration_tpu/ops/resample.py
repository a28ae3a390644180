"""Resampling ops (NHWC): pixel shuffle/unshuffle and the conv resamplers.

PixelShuffle channel ordering follows torch (C, r, r) sub-ordering so that
imported checkpoints (Restormer.py:171-190 Downsample/Upsample) are
bit-compatible after the OIHW->HWIO kernel transpose.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv


def pixel_shuffle(x, r: int):
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch channel order (c, i, j)."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(b, h * r, w * r, co)


def pixel_unshuffle(x, r: int):
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2), inverse of pixel_shuffle."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b h w c i j
    return x.reshape(b, h, w, c * r * r)


class Downsample(nn.Module):
    """3x3 conv to C/2 then PixelUnshuffle(2) => (H/2, W/2, 2C).

    Restormer.py:171-179. The conv is bias-free.

    Computed as ONE stride-2 4x4 conv: out[i,j, o*4+dy*2+dx] =
    conv3x3(x)[2i+dy, 2j+dx, o], so embedding the 3x3 kernel at offset
    (dy,dx) of a 4x4 kernel per phase reproduces the composition exactly.
    One conv at half resolution with 4x the output channels is a far
    better MXU/layout shape than a thin stride-1 conv followed by a
    6D shuffle transpose. Param tree is unchanged (built from the same
    (3,3,C,C/2) kernel at apply time).
    """

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from image_restoration_tpu.ops.common import ConvParams

        co = self.n_feat // 2
        ci = x.shape[-1]
        w, _ = ConvParams(co, ci, 3, False, self.param_dtype, name="body_0")()
        dt = x.dtype if self.dtype is None else self.dtype
        k4 = jnp.zeros((4, 4, ci, co, 2, 2), w.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                k4 = k4.at[dy:dy + 3, dx:dx + 3, :, :, dy, dx].set(w)
        k4 = k4.reshape(4, 4, ci, co * 4)
        return jax.lax.conv_general_dilated(
            x.astype(dt), k4.astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Upsample(nn.Module):
    """3x3 conv to 2C then PixelShuffle(2) => (2H, 2W, C/2).

    Restormer.py:181-189.
    """

    n_feat: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feat * 2, 3, padding=1, use_bias=False, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="body_0")(x)
        return pixel_shuffle(x, 2)


def resize_bilinear(x, out_h: int, out_w: int, align_corners: bool = False):
    """Bilinear resize matching torch F.interpolate semantics.

    torch's align_corners=False is jax.image 'linear' with half-pixel
    centers (the jax.image default).
    """
    b, _, _, c = x.shape
    if align_corners:
        # jax.image has no align_corners mode; implement via explicit gather.
        h, w = x.shape[1:3]
        ys = jnp.linspace(0.0, h - 1.0, out_h)
        xs = jnp.linspace(0.0, w - 1.0, out_w)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = (ys - y0).reshape(1, out_h, 1, 1)
        wx = (xs - x0).reshape(1, 1, out_w, 1)
        g = lambda yi, xi: x[:, yi][:, :, xi]
        top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
        bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
        return top * (1 - wy) + bot * wy
    return jax.image.resize(x, (b, out_h, out_w, c), method="linear")
