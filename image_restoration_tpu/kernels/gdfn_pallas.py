"""Fused LayerNorm + GDFN Pallas TPU kernel.

The Restormer-family block tail ``x + GDFN(LN(x))`` (Restormer.py:76-97,
137-150) is HBM-bound in XLA: LN, the 1x1 expand (2.66x channels), the 3x3
depthwise conv, the gate, and the 1x1 projection each round-trip the (large)
activation through HBM — ~0.8 GB per level-1 block at 512^2.

This kernel computes the whole tail in ONE pass: each grid step DMAs a
(TH+2, W+2, C) halo row-tile of the padded input into VMEM and produces the
final (TH, W, C) output tile, keeping the 2.66x-expanded intermediates
entirely in VMEM:

    read x tile -> LN (fp32 stats over the real C lanes)
                -> [pixels, C] @ W_content / @ W_gate   (MXU)
                -> halo-masked (matches torch's zero-padded dwconv input)
                -> 9-shift depthwise accumulate (VPU, fp32)
                -> gelu(content) * gate
                -> [pixels, H] @ W_out (MXU) + residual -> write tile

HBM traffic drops ~7x (one read + one write of x plus weights). Backward is
a custom VJP that recomputes via the plain-XLA composition — exact gradients,
fused speed where it matters (the inference/serving path).

Lane padding: channel and hidden dims are zero-padded to multiples of 128.
LN statistics divide by the REAL channel count; padded lanes carry zeros
through every matmul by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_tile(h: int, target: int) -> int:
    for t in range(min(target, h), 0, -1):
        if h % t == 0:
            return t
    return h


# One budget for every row-tiled kernel (block/mdta/gdfn/attn_core).
# 36 MB measured optimal on v5e with vmem_limit_bytes=100MB: 48 MB is flat,
# 64 MB regresses (big tiles starve Mosaic's double-buffering), and >36 MB
# can overflow the scoped stack at some shapes.
VMEM_BUDGET = 36 * 1024 * 1024


def pick_tile_height(h: int, *vmem_fns, budget: int = VMEM_BUDGET,
                     max_th: int = 64) -> int:
    """Largest divisor of ``h`` (<= max_th) whose estimated VMEM use stays
    under budget for EVERY supplied estimator ``vmem_fn(th) -> bytes``."""
    th = 1
    for t in sorted({d for d in range(1, h + 1) if h % d == 0}):
        if t <= max_th and all(f(t) <= budget for f in vmem_fns):
            th = t
    return th


def _gdfn_kernel(xprev_ref, xcur_ref, xnext_ref, lnw_ref, lnb_ref, wc_ref,
                 wg_ref, bc_ref, bg_ref, dwc_ref, dwg_ref, dbc_ref, dbg_ref,
                 wo_ref, bo_ref, o_ref, *, th: int, width: int, wp2: int,
                 c_real: int, ln_bias: bool, eps: float, h_total: int):
    """One grid step = one (batch, row-tile). The halo rows come from the
    previous/next row-blocks, which are ordinary BlockSpec inputs — Mosaic
    double-buffers them against compute (no manual DMA serialization)."""
    cp = o_ref.shape[-1]
    hp = wc_ref.shape[-1]
    hi = pl.program_id(1)
    th2 = th + 2

    xs = jnp.concatenate(
        [xprev_ref[0], xcur_ref[0], xnext_ref[0]], axis=0)
    xf = xs.astype(jnp.float32)  # (TH+2, Wp2, Cp)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mu = s1 / c_real
    var = s2 / c_real - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    if ln_bias:
        y = (xf - mu) * inv * lnw_ref[:] + lnb_ref[:]
    else:
        y = xf * inv * lnw_ref[:]

    # zero pixels outside the image (halo rows past the borders, left/right
    # pad columns) AFTER the projection bias — torch zero-pads the PROJECTED
    # dwconv input
    rows = jax.lax.broadcasted_iota(jnp.int32, (th2, wp2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th2, wp2), 1)
    grow = rows + hi * th - 1
    valid = (grow >= 0) & (grow < h_total) & (cols >= 1) & (cols <= width)
    mask = valid.astype(jnp.float32)[:, :, None]

    y2 = y.reshape(th2 * wp2, cp).astype(jnp.bfloat16)
    # pinned precision: global default_matmul_precision("highest") would
    # request an fp32 contraction on bf16 operands, which Mosaic rejects
    prec = jax.lax.Precision.DEFAULT
    cont = jnp.dot(y2, wc_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    gate = jnp.dot(y2, wg_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    # fp32 residency for the expanded maps: bf16 residency halves VMEM but
    # the 18 per-tap bf16->fp32 converts double the VPU time (profiled on
    # v5e); the tile picker bounds VMEM by shrinking TH instead
    cont = (cont + bc_ref[:]).reshape(th2, wp2, hp) * mask
    gate = (gate + bg_ref[:]).reshape(th2, wp2, hp) * mask

    acc_c = jnp.zeros((th, width, hp), jnp.float32)
    acc_g = jnp.zeros((th, width, hp), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            k = kh * 3 + kw
            acc_c = acc_c + cont[kh : kh + th, kw : kw + width, :] * dwc_ref[k]
            acc_g = acc_g + gate[kh : kh + th, kw : kw + width, :] * dwg_ref[k]
    acc_c = acc_c + dbc_ref[:]
    acc_g = acc_g + dbg_ref[:]

    # erf-based exact gelu; Mosaic lowers neither erf nor erfc, so use the
    # Abramowitz-Stegun 7.1.26 rational approximation (|err|<1.5e-7, far
    # below bf16 resolution)
    z = acc_c * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_z = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    act = 0.5 * acc_c * (1.0 + erf_z) * acc_g
    act2 = act.reshape(th * width, hp).astype(jnp.bfloat16)
    out = jnp.dot(act2, wo_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    out = out + bo_ref[:]
    res = xcur_ref[0, :, 1 : 1 + width, :].astype(jnp.float32)
    o_ref[0] = (out.reshape(th, width, cp) + res).astype(o_ref.dtype)


def _reference_ln_gdfn(x, params, ln_type: str, eps: float = 1e-5):
    """Plain-XLA composition (the exact math the kernel fuses) — used for
    the backward pass and for CPU execution."""
    (lnw, lnb, w_in, b_in, w_dw, b_dw, w_out, b_out) = params
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    var = jnp.var(xf, axis=-1, keepdims=True)
    if ln_type == "BiasFree":
        y = xf * jax.lax.rsqrt(var + eps) * lnw
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb
    y = y.astype(x.dtype)
    dt = x.dtype
    h = jax.lax.conv_general_dilated(
        y, w_in.reshape(1, 1, c, -1).astype(dt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b_in is not None:
        h = h + b_in.astype(dt)
    from image_restoration_tpu.ops.common import grouped_conv

    # partition-safe dwconv: this composition is the custom-VJP reference the
    # backward pass differentiates, and raw grouped-conv weight grads are
    # mis-reduced by the SPMD partitioner on multi-axis meshes (ops/common.py)
    h = grouped_conv(h, w_dw.astype(dt), (1, 1), ((1, 1), (1, 1)), (1, 1),
                     h.shape[-1])
    if b_dw is not None:
        h = h + b_dw.astype(dt)
    cbr, gbr = jnp.split(h, 2, axis=-1)
    a = jax.nn.gelu(cbr.astype(jnp.float32),
                    approximate=False).astype(x.dtype) * gbr
    hidden = cbr.shape[-1]
    out = jax.lax.conv_general_dilated(
        a, w_out.reshape(1, 1, hidden, c).astype(dt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b_out is not None:
        out = out + b_out.astype(dt)
    return x + out


def _fused_forward(x, params, ln_type: str, eps: float):
    if jax.default_backend() != "tpu":
        return _reference_ln_gdfn(x, params, ln_type, eps)
    (lnw, lnb, w_in, b_in, w_dw, b_dw, w_out, b_out) = params
    b, h, w, c = x.shape
    hidden2 = w_in.shape[-1]
    hidden = hidden2 // 2
    cp = _round_up(c, 128)
    hp = _round_up(hidden, 128)
    wp2_est = _round_up(w + 2, 16)

    def vmem_bytes(t):
        xs = (t + 2) * wp2_est * cp * 2    # cur tile + two 1-row halo blocks
        y32 = (t + 2) * wp2_est * cp * 4
        cg = 2 * (t + 2) * wp2_est * hp * 4  # fp32 expanded maps
        acc = 2 * t * w * hp * 4
        out = t * w * cp * 4
        return xs + y32 + cg + acc + out

    th = pick_tile_height(h, vmem_bytes)

    f32 = jnp.float32
    z = lambda n: jnp.zeros((n,), f32)
    lnw_p = jnp.pad(lnw.astype(f32), (0, cp - c))
    lnb_p = (jnp.pad(lnb.astype(f32), (0, cp - c)) if lnb is not None
             else jnp.zeros((cp,), f32))
    # w_in: (1,1,C,2H) HWIO or (C,2H)
    wi = w_in.reshape(c, hidden2).astype(jnp.bfloat16)
    wc = jnp.pad(wi[:, :hidden], ((0, cp - c), (0, hp - hidden)))
    wg = jnp.pad(wi[:, hidden:], ((0, cp - c), (0, hp - hidden)))
    bc = (jnp.pad(b_in[:hidden].astype(f32), (0, hp - hidden))
          if b_in is not None else z(hp))
    bg = (jnp.pad(b_in[hidden:].astype(f32), (0, hp - hidden))
          if b_in is not None else z(hp))
    # dwconv HWIO (3,3,1,2H) -> (9, 2H)
    dw = w_dw.reshape(9, hidden2).astype(f32)
    dwc = jnp.pad(dw[:, :hidden], ((0, 0), (0, hp - hidden)))
    dwg = jnp.pad(dw[:, hidden:], ((0, 0), (0, hp - hidden)))
    dbc = (jnp.pad(b_dw[:hidden].astype(f32), (0, hp - hidden))
           if b_dw is not None else z(hp))
    dbg = (jnp.pad(b_dw[hidden:].astype(f32), (0, hp - hidden))
           if b_dw is not None else z(hp))
    wo = jnp.pad(w_out.reshape(hidden, c).astype(jnp.bfloat16),
                 ((0, hp - hidden), (0, cp - c)))
    bo = jnp.pad(b_out.astype(f32), (0, cp - c)) if b_out is not None else z(cp)

    # sublane-align the width so row blocks tile cleanly; the extra
    # right-pad columns are masked out in-kernel
    wp2 = _round_up(w + 2, 16)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, wp2 - w - 1), (0, cp - c)))
    n_hi = h // th
    kern = functools.partial(
        _gdfn_kernel, th=th, width=w, wp2=wp2, c_real=c,
        ln_bias=(ln_type != "BiasFree"), eps=eps, h_total=h)
    # cur tile is a (th)-row block; the 1-row halos are fetched as
    # separate height-1 blocks (index in block units == row index), cutting
    # HBM reads from 3 tiles/step to 1 tile + 2 rows.
    cur = pl.BlockSpec((1, th, wp2, cp), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    row = lambda off: pl.BlockSpec(
        (1, 1, wp2, cp),
        lambda bi, hi, off=off: (bi, jnp.clip(hi * th + off, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, n_hi),
        in_specs=[row(-1), cur, row(th)] + [vspec] * 12,
        out_specs=pl.BlockSpec((1, th, w, cp), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, xp, xp, lnw_p, lnb_p, wc, wg, bc, bg, dwc, dwg, dbc, dbg, wo, bo)
    return out[..., :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_ln_gdfn(x, params, ln_type: str = "WithBias", eps: float = 1e-5):
    """x + GDFN(LN(x)) in one Pallas pass.

    params = (ln_weight, ln_bias|None, w_in (C,2H) or (1,1,C,2H),
              b_in|None, w_dw (3,3,1,2H), b_dw|None,
              w_out (H,C) or (1,1,H,C), b_out|None)
    """
    return _fused_forward(x, params, ln_type, eps)


def _fwd(x, params, ln_type, eps):
    return _fused_forward(x, params, ln_type, eps), (x, params)


def _bwd(ln_type, eps, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _reference_ln_gdfn(xx, pp, ln_type, eps),
                     x, params)
    return vjp(g)


fused_ln_gdfn.defvjp(_fwd, _bwd)
