"""Sparse-Kernel-Aggregation dynamic convolution (LSNet SKA).

Reference: the zoo's only custom device kernels — Triton forward/backward at
20251113_lsnet_xy/model/ska.py:11-114. Semantics (ska_fwd):

    o[n, c, i, j] = sum_{kh,kw} x[n, c, i-pad+kh, j-pad+kw]
                    * w[n, c % wc, kh*ks+kw, i, j]

i.e. a per-pixel k x k convolution whose weights vary with (batch, pixel) and
are shared across channel groups of stride ``wc`` (= dim // groups), with
zero padding and fp32 accumulation for fp16 inputs.

TPU design: the gather of the k^2 neighbors is expressed as k^2 statically
shifted slices of a zero-padded input, each fused into a multiply-accumulate
— XLA keeps it a single fused loop without materializing an unfold. The op
is fully differentiable (no custom autograd needed: the Triton backward
kernels are exactly the autodiff of this formulation). A Pallas kernel
(kernels/ska_pallas.py) provides the hand-tiled fast path.

NHWC layout: x (B, H, W, C); w (B, H, W, wc, k^2).
"""

from __future__ import annotations

import jax.numpy as jnp


def ska_xla(x, w):
    """x: (B,H,W,C); w: (B,H,W,wc,k2) with C % wc == 0. Returns (B,H,W,C)."""
    b, h, wd, c = x.shape
    wc = w.shape[3]
    k2 = w.shape[4]
    ks = int(k2**0.5)
    assert ks * ks == k2 and c % wc == 0
    pad = (ks - 1) // 2
    reps = c // wc

    acc_dtype = jnp.float32
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = jnp.zeros((b, h, wd, c), acc_dtype)
    for kh in range(ks):
        for kw in range(ks):
            shifted = xp[:, kh : kh + h, kw : kw + wd, :].astype(acc_dtype)
            # channel c uses weight channel c % wc: tile (wc,) -> (C,)
            wk = w[..., kh * ks + kw].astype(acc_dtype)  # (B,H,W,wc)
            wk = jnp.tile(wk, (1, 1, 1, reps))
            out = out + shifted * wk
    return out.astype(x.dtype)


def ska(x, w, use_pallas: bool = False):
    if use_pallas:
        from image_restoration_tpu.kernels.ska_pallas import ska_pallas

        return ska_pallas(x, w)
    return ska_xla(x, w)
