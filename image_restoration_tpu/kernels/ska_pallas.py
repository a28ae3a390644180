"""Pallas TPU kernel for SKA dynamic convolution (+custom VJP).

Replaces the reference Triton kernels (20251113_lsnet_xy/model/ska.py:20-114).
The forward tiles rows of the image; each grid step holds a (TH+2p, W+2p, C)
halo block of the padded input and a (TH, W, k2*wc) weight block in VMEM and
accumulates the k^2 shifted multiply-adds in fp32 on the VPU — one pass over
HBM for x and w, no unfold materialization.

Backward is the exact adjoint expressed as XLA shifted-slice MACs (the
Triton ska_bwd_x/ska_bwd_w equivalents); both fuse into single loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int, target: int = 32) -> int:
    for t in range(min(target, h), 0, -1):
        if h % t == 0:
            return t
    return h


def _ska_kernel(xp_hbm, w_ref, o_ref, *, ks: int, wc: int, reps: int, th: int,
                width: int, c: int):
    """One grid step = one (batch, row-tile). The halo block of the padded
    input overlaps neighboring tiles, which BlockSpecs cannot express — DMA
    it from HBM into VMEM scratch explicitly."""
    pad = (ks - 1) // 2
    cp_ = o_ref.shape[-1]  # 128-padded channel count
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    def body(xs_vmem, sem):
        cp = pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(hi * th, th + 2 * pad)], xs_vmem, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((th, width, cp_), jnp.float32)
        for kh in range(ks):
            for kw in range(ks):
                xs = xs_vmem[kh : kh + th, kw : kw + width, :].astype(jnp.float32)
                k = kh * ks + kw
                wk = w_ref[0, :, :, k * wc : (k + 1) * wc].astype(jnp.float32)
                wk = jnp.tile(wk, (1, 1, reps))  # channel c uses w[c % wc]
                if c != cp_:
                    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, cp_ - c)))
                acc = acc + xs * wk
        o_ref[0] = acc.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((th + 2 * pad, width + 2 * pad, cp_), xp_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _ska_forward(x, w):
    b, h, wd, c = x.shape
    wc, k2 = w.shape[3], w.shape[4]
    ks = int(k2**0.5)
    pad = (ks - 1) // 2
    reps = c // wc
    th = _pick_tile(h)

    # Mosaic DMA slices must be 128-aligned on the lane (channel) dim
    cp_ = _round_up(c, 128)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, cp_ - c)))
    # weight layout (k2-major, wc-minor) so each k-slice is lane-contiguous
    wt = w.transpose(0, 1, 2, 4, 3).reshape(b, h, wd, k2 * wc)

    kern = functools.partial(_ska_kernel, ks=ks, wc=wc, reps=reps, th=th,
                             width=wd, c=c)
    out = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec((1, th, wd, k2 * wc), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cp_), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cp_), x.dtype),
    )(xp, wt)
    return out[..., :c]


@jax.custom_vjp
def ska_pallas(x, w):
    """x: (B,H,W,C); w: (B,H,W,wc,k2). See ops/ska.py for semantics."""
    return _ska_forward(x, w)


def _ska_fwd(x, w):
    return _ska_forward(x, w), (x, w)


def _ska_bwd(res, go):
    x, w = res
    b, h, wd, c = x.shape
    wc, k2 = w.shape[3], w.shape[4]
    ks = int(k2**0.5)
    pad = (ks - 1) // 2
    reps = c // wc
    f32 = jnp.float32

    # gx[u,v] = sum_k (go * w_k)[u + p - kh, v + p - kw]  (ska_bwd_x adjoint)
    gx = jnp.zeros((b, h, wd, c), f32)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    gw_parts = []
    for kh in range(ks):
        for kw in range(ks):
            k = kh * ks + kw
            wk = jnp.tile(w[..., k].astype(f32), (1, 1, 1, reps))
            prod = go.astype(f32) * wk
            pp = jnp.pad(prod, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            gx = gx + pp[:, 2 * pad - kh : 2 * pad - kh + h,
                         2 * pad - kw : 2 * pad - kw + wd, :]
            # gw[..., cw, k] = sum_reps go[..., cw + r*wc] * x_shifted
            xs = xp[:, kh : kh + h, kw : kw + wd, :].astype(f32)
            gwk = (go.astype(f32) * xs).reshape(b, h, wd, reps, wc).sum(axis=3)
            gw_parts.append(gwk)
    gw = jnp.stack(gw_parts, axis=-1)  # (B,H,W,wc,k2)
    return gx.astype(x.dtype), gw.astype(w.dtype)


ska_pallas.defvjp(_ska_fwd, _ska_bwd)
