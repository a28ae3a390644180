"""Fused MDTA attention-core Pallas kernels.

Completes the Restormer block's attention half on-chip: given the
slot-padded qkv map from kernels/mdta_pallas.fused_ln_qkv_dwconv_split,
computes (Restormer.py:117-131 semantics)

    out = x + project_out( softmax(norm-rescaled q^T k * temperature) @ v )

in two streaming passes instead of ~6 XLA HBM round trips:

* **Pass A** (``_acc_kernel``): one matmul per row tile accumulates the raw
  (CP x CP) q^T k product in fp32 across the whole image, together with the
  per-channel sum-of-squares of q and k. Because the channel layout is
  head-major, every head's (ch x ch) attention matrix is a diagonal block
  of the full product — one big MXU contraction replaces per-head einsums.
* **Finalize** (plain XLA, O(C^2) work): the L2 normalization commutes with
  the contraction — normalize(q)^T normalize(k) = (q^T k) / (||q_c||
  ||k_d||) — so the tiny product matrix is rescaled by the norm outer
  product, scaled by the per-head temperature, softmaxed per head, and the
  per-head results are scattered back onto the diagonal blocks (zeros
  elsewhere, so cross-head terms vanish in pass B).
* **Pass B** (``_apply_kernel``): per row tile, ``(v @ A^T) @ W_proj + b_proj
  + x`` — two chained MXU matmuls, residual add fused, one read of v and x,
  one write of the block output.

On CPU (tests) falls back to the reference composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_restoration_tpu.kernels.gdfn_pallas import _round_up, pick_tile_height


def _acc_kernel(qk_in_ref, qkprod_ref, qss_ref, kss_ref, *, cps: int):
    hi = pl.program_id(1)
    th, w = qk_in_ref.shape[1], qk_in_ref.shape[2]
    q = qk_in_ref[0, :, :, :cps].reshape(th * w, cps)
    k = qk_in_ref[0, :, :, cps:].reshape(th * w, cps)
    prod = jax.lax.dot_general(q, k, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qs = jnp.sum(qf * qf, axis=0, keepdims=True)
    ks = jnp.sum(kf * kf, axis=0, keepdims=True)

    @pl.when(hi == 0)
    def _init():
        qkprod_ref[0] = prod
        qss_ref[0] = qs
        kss_ref[0] = ks

    @pl.when(hi != 0)
    def _accum():
        qkprod_ref[0] += prod
        qss_ref[0] += qs
        kss_ref[0] += ks


def _apply_kernel(v_ref, x_ref, at_ref, w_ref, b_ref, o_ref, *, c_real: int):
    th, w = v_ref.shape[1], v_ref.shape[2]
    cps = v_ref.shape[-1]
    v = v_ref[0].reshape(th * w, cps)
    t = jnp.dot(v, at_ref[0], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    t = t.astype(v.dtype)
    o = jnp.dot(t, w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT) + b_ref[:]
    o = o[:, :c_real].reshape(th, w, c_real)
    o_ref[0] = (x_ref[0].astype(jnp.float32) + o).astype(o_ref.dtype)


def _reference_core(qkv_padded, x, temperature, w_proj, b_proj,
                    num_heads: int, gate=None):
    from image_restoration_tpu.ops.attention import mdta_attention

    c = x.shape[-1]
    cps = qkv_padded.shape[-1] // 3
    q = qkv_padded[..., 0:c]
    k = qkv_padded[..., cps:cps + c]
    v = qkv_padded[..., 2 * cps:2 * cps + c]
    a = mdta_attention(q, k, v, temperature, num_heads)
    if gate is not None:
        # CG-IR context output gate: per-(batch, channel) sigmoid applied to
        # the attention output BEFORE project_out (model.py:407-433)
        a = a * gate[:, None, None, :].astype(a.dtype)
    dt = x.dtype
    o = jax.lax.conv_general_dilated(
        a.astype(dt), w_proj.reshape(1, 1, c, c).astype(dt), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b_proj is not None:
        o = o + b_proj.astype(dt)
    return x + o


def _forward(qkv_padded, x, temperature, w_proj, b_proj, num_heads: int):
    if jax.default_backend() != "tpu":
        return _reference_core(qkv_padded, x, temperature, w_proj, b_proj,
                               num_heads)
    b, h, w, op3 = qkv_padded.shape
    c = x.shape[-1]
    cps = op3 // 3
    ch = c // num_heads

    def vmem_a(t):
        qk = t * w * 2 * cps * qkv_padded.dtype.itemsize
        f32 = 2 * t * w * cps * 4
        return qk + f32 + cps * cps * 4

    def vmem_b(t):
        return (t * w * cps * 2 + 2 * t * w * c * x.dtype.itemsize
                + t * w * cps * 4 * 2)

    th = pick_tile_height(h, vmem_a, vmem_b)
    n_hi = h // th

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # ---- pass A: accumulate q^T k and channel sumsq over row tiles ----
    prod, qss, kss = pl.pallas_call(
        functools.partial(_acc_kernel, cps=cps),
        grid=(b, n_hi),
        in_specs=[pl.BlockSpec((1, th, w, 2 * cps),
                               lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, cps, cps), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cps), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cps), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cps, cps), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cps), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cps), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_padded)

    # ---- finalize: norm rescale + temperature + per-head softmax ----
    qn = jnp.maximum(jnp.sqrt(qss[:, 0, :c]), 1e-12)  # (b, c)
    kn = jnp.maximum(jnp.sqrt(kss[:, 0, :c]), 1e-12)
    logits = prod[:, :c, :c] / (qn[:, :, None] * kn[:, None, :])
    temp = temperature.reshape(num_heads).astype(jnp.float32)
    afull = jnp.zeros((b, cps, cps), jnp.float32)
    for i in range(num_heads):
        blk = logits[:, i * ch:(i + 1) * ch, i * ch:(i + 1) * ch] * temp[i]
        blk = jax.nn.softmax(blk, axis=-1)
        afull = jax.lax.dynamic_update_slice(afull, blk, (0, i * ch, i * ch))
    at = jnp.swapaxes(afull, 1, 2).astype(qkv_padded.dtype)  # v @ A^T

    # ---- pass B: out = x + (v @ A^T) @ W_proj + b ----
    dt = x.dtype
    wp = jnp.zeros((cps, cps), dt).at[:c, :c].set(
        w_proj.reshape(c, c).astype(dt))
    bp = (jnp.pad(b_proj.astype(jnp.float32), (0, cps - c))
          if b_proj is not None else jnp.zeros((cps,), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_apply_kernel, c_real=c),
        grid=(b, n_hi),
        in_specs=[
            pl.BlockSpec((1, th, w, cps), lambda bi, hi: (bi, hi, 0, 2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cps, cps), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv_padded, x, at, wp, bp)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mdta_core(qkv_padded, x, temperature, w_proj, b_proj,
                    num_heads: int):
    """x + project_out(MDTA(qkv)) with the slot-padded qkv layout.

    qkv_padded: (B,H,W,3*cps) from fused_ln_qkv_dwconv_split; x: (B,H,W,C)
    block input (residual source); w_proj: (C,C) or (1,1,C,C).
    """
    return _forward(qkv_padded, x, temperature, w_proj, b_proj, num_heads)


def _fwd(qkv_padded, x, temperature, w_proj, b_proj, num_heads):
    return (_forward(qkv_padded, x, temperature, w_proj, b_proj, num_heads),
            (qkv_padded, x, temperature, w_proj, b_proj))


def _bwd(num_heads, res, g):
    qkv_padded, x, temperature, w_proj, b_proj = res
    if b_proj is None:
        f = lambda qq, xx, tt, ww: _reference_core(qq, xx, tt, ww, None,
                                                   num_heads)
        _, vjp = jax.vjp(f, qkv_padded, x, temperature, w_proj)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda qq, xx, tt, ww, bb: _reference_core(qq, xx, tt, ww, bb,
                                                   num_heads),
        qkv_padded, x, temperature, w_proj, b_proj)
    return vjp(g)


fused_mdta_core.defvjp(_fwd, _bwd)
