"""Fused LayerNorm + qkv-projection + 3x3-depthwise Pallas kernel.

The MDTA front half ``dwconv3(qkv1x1(LN(x)))`` (Restormer.py:99-117) costs
four HBM round trips in XLA (LN read/write, 1x1 read/write-3x, dwconv
read/write-3x). This kernel produces the depthwise-convolved qkv tensor in
ONE pass over x using the same pipelined prev/cur/next row-block scheme as
kernels/gdfn_pallas.py. The attention contraction itself (global over HW)
stays in XLA.

Exact math for the bias-free flagship config; biased variants also fused
(the dwconv's zero padding applies to the PROJECTED map — halo masking
after the bias add reproduces it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_restoration_tpu.kernels.gdfn_pallas import (
    _pick_tile, _round_up, pick_tile_height,
)


def _kernel(xprev_ref, xcur_ref, xnext_ref, lnw_ref, lnb_ref, w_ref, b_ref,
            dw_ref, db_ref, o_ref, *, th: int, width: int, wp2: int,
            c_real: int, ln_bias: bool, eps: float, h_total: int):
    cp = xcur_ref.shape[-1]
    op = o_ref.shape[-1]
    hi = pl.program_id(1)
    th2 = th + 2

    xs = jnp.concatenate(
        [xprev_ref[0], xcur_ref[0], xnext_ref[0]], axis=0)
    xf = xs.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mu = s1 / c_real
    var = s2 / c_real - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    if ln_bias:
        y = (xf - mu) * inv * lnw_ref[:] + lnb_ref[:]
    else:
        y = xf * inv * lnw_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (th2, wp2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th2, wp2), 1)
    grow = rows + hi * th - 1
    valid = (grow >= 0) & (grow < h_total) & (cols >= 1) & (cols <= width)
    mask = valid.astype(jnp.float32)[:, :, None]

    y2 = y.reshape(th2 * wp2, cp).astype(jnp.bfloat16)
    # pin precision: a global default_matmul_precision("highest") would ask
    # Mosaic for an fp32-precision contraction on bf16 operands (unsupported)
    proj = jnp.dot(y2, w_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
    proj = (proj + b_ref[:]).reshape(th2, wp2, op) * mask

    acc = jnp.zeros((th, width, op), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            acc = acc + proj[kh : kh + th, kw : kw + width, :] * dw_ref[kh * 3 + kw]
    acc = acc + db_ref[:]
    o_ref[0] = acc.astype(o_ref.dtype)


def _forward(x, params, ln_type: str, eps: float, split_pad: bool = False):
    (lnw, lnb, w_qkv, b_qkv, w_dw, b_dw) = params
    if jax.default_backend() != "tpu":
        return _reference(x, params, ln_type, eps, split_pad=split_pad)
    b, h, w, c = x.shape
    oc = w_qkv.reshape(c, -1).shape[-1]
    cp = _round_up(c, 128)
    if split_pad:
        # place q/k/v each at a 128-lane-aligned slot so the attention-core
        # kernel can slice them for free: out lanes are
        # [q | pad | k | pad | v | pad], slot width cps = round_up(oc/3, 128)
        csub = oc // 3
        cps = _round_up(csub, 128)
        op = 3 * cps
    else:
        op = _round_up(oc, 128)
    wp2 = _round_up(w + 2, 16)

    def vmem_bytes(t):
        xs = (t + 2) * wp2 * cp * 2   # cur tile + two 1-row halo blocks
        y32 = (t + 2) * wp2 * cp * 4
        proj = (t + 2) * wp2 * op * 4
        acc = t * w * op * 4
        return xs + y32 + proj + acc * 2

    th = pick_tile_height(h, vmem_bytes)

    f32 = jnp.float32
    lnw_p = jnp.pad(lnw.astype(f32), (0, cp - c))
    lnb_p = (jnp.pad(lnb.astype(f32), (0, cp - c)) if lnb is not None
             else jnp.zeros((cp,), f32))

    def place(mat2d, fill_dtype):
        """Pad the oc columns of (rows, oc) into the op-wide slot layout."""
        rows = mat2d.shape[0]
        if not split_pad:
            return jnp.pad(mat2d, ((0, 0), (0, op - oc)))
        out = jnp.zeros((rows, op), fill_dtype)
        for i in range(3):
            out = jax.lax.dynamic_update_slice(
                out, mat2d[:, i * csub:(i + 1) * csub], (0, i * cps))
        return out

    wq = jnp.pad(place(w_qkv.reshape(c, oc).astype(jnp.bfloat16), jnp.bfloat16),
                 ((0, cp - c), (0, 0)))
    bq = (place(b_qkv.astype(f32)[None], f32)[0] if b_qkv is not None
          else jnp.zeros((op,), f32))
    dw = place(w_dw.reshape(9, oc).astype(f32), f32)
    db = (place(b_dw.astype(f32)[None], f32)[0] if b_dw is not None
          else jnp.zeros((op,), f32))

    xp = jnp.pad(x, ((0, 0), (0, 0), (1, wp2 - w - 1), (0, cp - c)))
    n_hi = h // th
    kern = functools.partial(_kernel, th=th, width=w, wp2=wp2, c_real=c,
                             ln_bias=(ln_type != "BiasFree"), eps=eps,
                             h_total=h)
    cur = pl.BlockSpec((1, th, wp2, cp), lambda bi, hi: (bi, hi, 0, 0),
                       memory_space=pltpu.VMEM)
    rowb = lambda off: pl.BlockSpec(
        (1, 1, wp2, cp),
        lambda bi, hi, off=off: (bi, jnp.clip(hi * th + off, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, n_hi),
        in_specs=[rowb(-1), cur, rowb(th)] + [vspec] * 6,
        out_specs=pl.BlockSpec((1, th, w, op), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, op), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, xp, xp, lnw_p, lnb_p, wq, bq, dw, db)
    return out if split_pad else out[..., :oc]


def _reference(x, params, ln_type: str, eps: float = 1e-5,
               split_pad: bool = False):
    (lnw, lnb, w_qkv, b_qkv, w_dw, b_dw) = params
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
        y, w_qkv.reshape(1, 1, c, -1).astype(dt), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b_qkv is not None:
        h = h + b_qkv.astype(dt)
    from image_restoration_tpu.ops.common import grouped_conv

    # partition-safe dwconv: this composition is the custom-VJP reference the
    # backward pass differentiates, and raw grouped-conv weight grads are
    # mis-reduced by the SPMD partitioner on multi-axis meshes (ops/common.py)
    h = grouped_conv(h, w_dw.astype(dt), (1, 1), ((1, 1), (1, 1)), (1, 1),
                     h.shape[-1])
    if b_dw is not None:
        h = h + b_dw.astype(dt)
    if split_pad:
        oc = h.shape[-1]
        csub = oc // 3
        cps = _round_up(csub, 128)
        parts = [jnp.pad(p, ((0, 0),) * 3 + ((0, cps - csub),))
                 for p in jnp.split(h, 3, axis=-1)]
        h = jnp.concatenate(parts, axis=-1)
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_ln_qkv_dwconv(x, params, ln_type: str = "WithBias",
                        eps: float = 1e-5):
    """dwconv3(qkv1x1(LN(x))) in one Pallas pass.

    params = (ln_w, ln_b|None, w_qkv (C,3C) or (1,1,C,3C), b_qkv|None,
              w_dw (3,3,1,3C), b_dw|None).
    """
    return _forward(x, params, ln_type, eps)


def _fwd(x, params, ln_type, eps):
    return _forward(x, params, ln_type, eps), (x, params)


def _bwd(ln_type, eps, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _reference(xx, pp, ln_type, eps), x, params)
    return vjp(g)


fused_ln_qkv_dwconv.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_ln_qkv_dwconv_split(x, params, ln_type: str = "WithBias",
                              eps: float = 1e-5):
    """Same as fused_ln_qkv_dwconv, but q/k/v each land on a 128-lane-aligned
    slot: output (B, H, W, 3*cps) with cps = round_up(C, 128), real channels
    at [i*cps : i*cps+C]. Feeds kernels/attn_core_pallas.fused_mdta_core."""
    return _forward(x, params, ln_type, eps, split_pad=True)


def _fwd_split(x, params, ln_type, eps):
    return _forward(x, params, ln_type, eps, split_pad=True), (x, params)


def _bwd_split(ln_type, eps, res, g):
    x, params = res
    _, vjp = jax.vjp(
        lambda xx, pp: _reference(xx, pp, ln_type, eps, split_pad=True),
        x, params)
    return vjp(g)


fused_ln_qkv_dwconv_split.defvjp(_fwd_split, _bwd_split)
