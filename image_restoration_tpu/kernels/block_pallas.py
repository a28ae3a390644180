"""Whole-TransformerBlock Pallas fusion: two HBM passes per block.

The Restormer block (Restormer.py:137-150) is, per 512^2 level-1 block,
~70 GFLOP of MXU work but — composed from the three existing fused kernels
(mdta front, attn core A/B, GDFN tail) — still makes ~8 HBM trips plus four
XLA pad/slice copies. This module collapses the whole block to TWO passes
over a persistent "canvas" layout:

  canvas: (B, H, WP, CP) bf16 — image columns at [1 .. w], one zero border
  column left/right (the dwconv halo), lane-padded channels. The canvas is
  produced once per level (``canvas_pad``) and threads through every block
  of that level unchanged, so no per-block pad/slice copies exist at all.

  Pass 1 (front+accumulate, grid (B, H/th) accumulating over rows):
      read x tile -> LN1 -> qkv 1x1 (MXU) -> halo-masked 3x3 depthwise
      -> write ONLY the v slot back to HBM (canvas layout)
      -> accumulate  q^T k  (cps x cps, fp32, MXU)  and per-channel
         sum-of-squares of q/k across the grid.
      q and k never touch HBM.

  Finalize (plain XLA, O(C^2)): L2-norm rescale of the raw product
  (normalization commutes with the contraction), per-head temperature,
  per-head softmax, scatter onto the block-diagonal, transpose -> A^T.

  Pass 2 (apply+GDFN, grid (B, H/th)):
      read v tile (+1 halo row each side) and x tile
      -> attn_out = x + v @ (A^T W_proj) + b   (ONE MXU matmul — A^T is
         folded into W_proj in the finalize; computed for th+2 rows so the
         GDFN dwconv halo is recomputed locally instead of re-read)
      -> LN2 -> merged [cont|gate] 1x1 expand (one MXU matmul)
      -> halo-masked 3x3 depthwise (one 9-tap loop over 2*hp lanes)
      -> gelu(cont)*gate -> 1x1 out (MXU) + attn_out residual
      -> write the block output tile (canvas layout).

HBM traffic per block drops from ~1.1 GB to ~0.34 GB at 512^2 x 96 (the
bench-dominating shape). Backward = custom VJP recomputing the plain-XLA
composition (exact gradients). Non-TPU backends run the reference
composition on the unpadded tensor (tests validate plumbing + math on CPU;
TPU numerics are checked by tools/check_fused_block.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_restoration_tpu.kernels.gdfn_pallas import (
    VMEM_BUDGET,
    _reference_ln_gdfn,
    _round_up,
    pick_tile_height,
)
from image_restoration_tpu.kernels.mdta_pallas import _reference as _ref_front
from image_restoration_tpu.kernels.attn_core_pallas import _reference_core


# ---------------------------------------------------------------- canvas ---

def canvas_pad(x, *, lanes: int = 128, border: int = 1):
    """(B,H,W,C) -> (B,H,WP,CP) with image at columns [border..border+w),
    zero border columns (the dwconv halo: 1 for 3x3 stacks, 2 for 5x5 —
    DRSformer's MSFN), lane-padded channels."""
    b, h, w, c = x.shape
    wp = _round_up(w + 2 * border, 16)
    cp = _round_up(c, lanes)
    return jnp.pad(x, ((0, 0), (0, 0), (border, wp - w - border),
                       (0, cp - c)))


def canvas_unpad(xc, w: int, c: int, border: int = 1):
    return xc[:, :, border : border + w, :c]


# ---------------------------------------------------------------- pass 1 ---

def _front_kernel(xprev_ref, xcur_ref, xnext_ref, lnw_ref, lnb_ref, w_ref,
                  b_ref, dw_ref, db_ref, v_ref, qkprod_ref, ss_ref,
                  *, th: int, width: int, c_real: int, cps: int,
                  offs: tuple, qk_lo: int, qk_hi: int, ln_bias: bool,
                  eps: float, h_total: int, bf16_taps: bool = False,
                  border: int = 1):
    """Slots sit at lane offsets ``offs`` = (v, q, k) (see ``_pack_params``):
    v starts at lane 0 so the canvas write is the granule-aligned slice
    ``acc[:, :, :cps]`` — any junk lanes beyond c_real are annihilated in
    pass 2 by A^T's zero rows, so no in-kernel lane pad or offset extraction
    (Mosaic relayouts, ~0.4 ms/block at 512^2) is needed. q^T k is contracted
    over the granule-aligned lane span [qk_lo:qk_hi] (large grids) or by
    per-slot extraction (small grids); the finalize step slices the
    (q block x k block) out of the span product in plain XLA."""
    wp = xcur_ref.shape[2]
    cp = xcur_ref.shape[-1]
    op = w_ref.shape[-1]  # 3*cs rounded up to the lane granule
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

    rows = jax.lax.broadcasted_iota(jnp.int32, (th2, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th2, wp), 1)
    grow = rows + hi * th - 1
    valid = ((grow >= 0) & (grow < h_total) & (cols >= border)
             & (cols < border + width))
    mask = valid.astype(jnp.float32)[:, :, None]

    pipe = _pipe_chunks(th)
    if not pipe:
        y2 = y.reshape(th2 * wp, cp).astype(jnp.bfloat16)
        proj = jnp.dot(y2, w_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
        proj = (proj + b_ref[:]).reshape(th2, wp, op) * mask
        if bf16_taps:
            # A/B knob (IR_TPU_BF16_TAPS): bf16 tap inputs, fp32 accumulation
            proj = proj.astype(jnp.bfloat16)

        # hoist the 3 column shifts (sublane rotates) out of the 9-tap loop;
        # the row shifts are leading-dim slices, which cost nothing.
        shifted = [proj[:, border - 1 + kw : border - 1 + kw + width, :]
                   for kw in range(3)]
        acc = jnp.zeros((th, width, op), jnp.float32)
        for kh in range(3):
            for kw in range(3):
                acc = acc + shifted[kw][kh : kh + th] * dw_ref[kh * 3 + kw]
        acc = acc + db_ref[:]
    else:
        # IR_TPU_PIPE: 1-deep software pipe over row chunks — issue the
        # chunk-(r+1) matmul (MXU) before consuming chunk r's tap loop (VPU)
        # so the two units overlap. Same math: chunk r's matmul covers rows
        # [r*rt, r*rt+rt+2) of the th2-row tile (the 2 halo rows recomputed,
        # (rt+2)/rt extra MXU FLOPs buys the overlap).
        rt = th // pipe
        yb = y.astype(jnp.bfloat16)

        def mat(r):
            chunk = yb[r * rt : r * rt + rt + 2].reshape((rt + 2) * wp, cp)
            p = jnp.dot(chunk, w_ref[:], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            p = ((p + b_ref[:]).reshape(rt + 2, wp, op)
                 * mask[r * rt : r * rt + rt + 2])
            return p.astype(jnp.bfloat16) if bf16_taps else p

        def taps(p):
            sh = [p[:, border - 1 + kw : border - 1 + kw + width, :]
                  for kw in range(3)]
            a = jnp.zeros((rt, width, op), jnp.float32)
            for kh in range(3):
                for kw in range(3):
                    a = a + sh[kw][kh : kh + rt] * dw_ref[kh * 3 + kw]
            return a

        p_prev = mat(0)
        accs = []
        for r in range(pipe):
            p_next = mat(r + 1) if r + 1 < pipe else None
            accs.append(taps(p_prev))
            p_prev = p_next
        acc = jnp.concatenate(accs, axis=0) + db_ref[:]

    # v slot (lanes [0:c_real]) -> canvas tile, granule-aligned slice store;
    # lanes [c_real:cps] carry junk (q values) that pass 2 annihilates.
    v_ref[0] = jnp.zeros((th, wp, cps), v_ref.dtype)
    v_ref[0, :, border : border + width, :] = acc[:, :, :cps].astype(
        v_ref.dtype)

    if qk_lo is not None:
        # q^T k over the aligned lane span; no per-slot extraction. 2x the
        # dot FLOPs of per-slot q^T k, but zero lane relayouts — the right
        # trade at large spatial grids where relayouts dominate.
        sf = acc[:, :, qk_lo:qk_hi].reshape(th * width, qk_hi - qk_lo)
        prod = jax.lax.dot_general(sf.astype(jnp.bfloat16),
                                   sf.astype(jnp.bfloat16),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
        ss = jnp.sum(sf * sf, axis=0, keepdims=True)
    else:
        # small grids: per-slot extraction keeps the accumulators cps-sized
        # (the relayout cost is proportionally smaller here)
        def slot(i):
            sl = acc[:, :, offs[i] : offs[i] + c_real]
            if c_real < cps:
                sl = jnp.pad(sl, ((0, 0), (0, 0), (0, cps - c_real)))
            return sl

        qf = slot(1).reshape(th * width, cps)
        kf = slot(2).reshape(th * width, cps)
        prod = jax.lax.dot_general(qf.astype(jnp.bfloat16),
                                   kf.astype(jnp.bfloat16),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
        ss = jnp.concatenate(
            [jnp.sum(qf * qf, axis=0, keepdims=True),
             jnp.sum(kf * kf, axis=0, keepdims=True)], axis=-1)

    @pl.when(hi == 0)
    def _init():
        qkprod_ref[0] = prod
        ss_ref[0] = ss

    @pl.when(hi != 0)
    def _accum():
        qkprod_ref[0] += prod
        ss_ref[0] += ss


# ---------------------------------------------------------------- pass 2 ---

def _apply_gdfn_kernel(vprev_ref, vcur_ref, vnext_ref, xprev_ref, xcur_ref,
                       xnext_ref, atw_ref, bp_ref, lnw_ref, lnb_ref,
                       wcg_ref, bcg_ref, dwcg_ref, dbcg_ref,
                       wo_ref, bo_ref, o_ref, *, th: int,
                       width: int, c_real: int, hp: int, ln_bias: bool,
                       eps: float, h_total: int, bf16_taps: bool = False):
    wp = xcur_ref.shape[2]
    cp = xcur_ref.shape[-1]
    cps = vcur_ref.shape[-1]
    hi = pl.program_id(1)
    th2 = th + 2
    prec = jax.lax.Precision.DEFAULT

    vs = jnp.concatenate(
        [vprev_ref[0], vcur_ref[0], vnext_ref[0]], axis=0)
    xs = jnp.concatenate(
        [xprev_ref[0], xcur_ref[0], xnext_ref[0]], axis=0)

    # attn_out = x + v @ (A^T W_proj) + b, for th+2 rows (GDFN halo rows
    # recomputed locally — cheaper than an extra HBM round trip). A^T W_proj
    # is pre-folded in plain XLA (finalize), saving a matmul per tile; its
    # rows beyond c_real are zero, annihilating the v canvas's junk lanes.
    v2 = vs.reshape(th2 * wp, cps)
    ao = jnp.dot(v2, atw_ref[0], preferred_element_type=jnp.float32,
                 precision=prec) + bp_ref[:]
    ao = ao.reshape(th2, wp, cp) + xs.astype(jnp.float32)

    # LN2 over the real channel lanes (padded lanes of ao are zero: x pad is
    # zero, W_proj pad columns are zero, b pad is zero)
    s1 = jnp.sum(ao, axis=-1, keepdims=True)
    s2 = jnp.sum(ao * ao, axis=-1, keepdims=True)
    mu = s1 / c_real
    var = s2 / c_real - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    if ln_bias:
        y = (ao - mu) * inv * lnw_ref[:] + lnb_ref[:]
    else:
        y = ao * inv * lnw_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (th2, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th2, wp), 1)
    grow = rows + hi * th - 1
    valid = (grow >= 0) & (grow < h_total) & (cols >= 1) & (cols <= width)
    mask = valid.astype(jnp.float32)[:, :, None]

    # cont|gate merged at [0:hp]|[hp:2hp] — one matmul, one mask pass, one
    # tap loop; the halves split back out as granule-aligned (free) slices.
    pipe = _pipe_chunks(th)
    if not pipe:
        y2 = y.reshape(th2 * wp, cp).astype(jnp.bfloat16)
        cg = jnp.dot(y2, wcg_ref[:], preferred_element_type=jnp.float32,
                     precision=prec)
        cg = (cg + bcg_ref[:]).reshape(th2, wp, 2 * hp) * mask
        if bf16_taps:
            cg = cg.astype(jnp.bfloat16)

        shifted = [cg[:, kw : kw + width, :] for kw in range(3)]
        acc = jnp.zeros((th, width, 2 * hp), jnp.float32)
        for kh in range(3):
            for kw in range(3):
                acc = acc + shifted[kw][kh : kh + th] * dwcg_ref[kh * 3 + kw]
        acc = acc + dbcg_ref[:]
    else:
        # software-pipelined chunks (see _front_kernel): overlap the
        # cont|gate expand matmul of chunk r+1 with chunk r's tap loop.
        rt = th // pipe
        yb = y.astype(jnp.bfloat16)

        def mat(r):
            chunk = yb[r * rt : r * rt + rt + 2].reshape((rt + 2) * wp, cp)
            p = jnp.dot(chunk, wcg_ref[:], preferred_element_type=jnp.float32,
                        precision=prec)
            p = ((p + bcg_ref[:]).reshape(rt + 2, wp, 2 * hp)
                 * mask[r * rt : r * rt + rt + 2])
            return p.astype(jnp.bfloat16) if bf16_taps else p

        def taps(p):
            sh = [p[:, kw : kw + width, :] for kw in range(3)]
            a = jnp.zeros((rt, width, 2 * hp), jnp.float32)
            for kh in range(3):
                for kw in range(3):
                    a = a + sh[kw][kh : kh + rt] * dwcg_ref[kh * 3 + kw]
            return a

        p_prev = mat(0)
        accs = []
        for r in range(pipe):
            p_next = mat(r + 1) if r + 1 < pipe else None
            accs.append(taps(p_prev))
            p_prev = p_next
        acc = jnp.concatenate(accs, axis=0) + dbcg_ref[:]
    acc_c = acc[:, :, :hp]
    acc_g = acc[:, :, hp:]

    # exact-gelu via Abramowitz-Stegun erf (Mosaic lowers no erf primitive)
    z = acc_c * 0.7071067811865476
    az = jnp.abs(z)
    tt = 1.0 / (1.0 + 0.3275911 * az)
    poly = tt * (0.254829592 + tt * (-0.284496736 + tt * (
        1.421413741 + tt * (-1.453152027 + tt * 1.061405429))))
    erf_z = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    act = 0.5 * acc_c * (1.0 + erf_z) * acc_g
    act2 = act.reshape(th * width, hp).astype(jnp.bfloat16)
    out = jnp.dot(act2, wo_ref[:], preferred_element_type=jnp.float32,
                  precision=prec) + bo_ref[:]
    out = out.reshape(th, width, cp) + ao[1 : 1 + th, 1 : 1 + width, :]

    o_ref[0] = jnp.zeros((th, wp, cp), o_ref.dtype)
    o_ref[0, :, 1 : 1 + width, :] = out.astype(o_ref.dtype)


# -------------------------------------------------------------- assembly ---

def pack_front(front, c, cp, cps, offs, op):
    """Pack the pass-1 (LN1 + qkv + 3x3 dw + proj) weights into the
    lane-aligned canvas layout. Slots sit at lane offsets ``offs`` inside op
    lanes, ordered (v, q, k) — v first so the kernel's canvas write is a
    granule-aligned slice (see ``_front_kernel``). Shared with the DRSformer
    TKSA front (kernels/drs_block_pallas)."""
    (ln1w, ln1b, w_qkv, b_qkv, w_dw, b_dw, w_proj, b_proj) = front
    f32, bf = jnp.float32, jnp.bfloat16

    def place3(mat2d, dtype):
        rows = mat2d.shape[0]
        out = jnp.zeros((rows, op), dtype)
        for dst, src in enumerate((2, 0, 1)):  # slot order (v, q, k)
            out = jax.lax.dynamic_update_slice(
                out, mat2d[:, src * c : (src + 1) * c], (0, offs[dst]))
        return out

    p = {}
    p["ln1w"] = jnp.pad(ln1w.astype(f32), (0, cp - c))
    p["ln1b"] = (jnp.pad(ln1b.astype(f32), (0, cp - c)) if ln1b is not None
                 else jnp.zeros((cp,), f32))
    p["wq"] = jnp.pad(place3(w_qkv.reshape(c, 3 * c).astype(bf), bf),
                      ((0, cp - c), (0, 0)))
    p["bq"] = (place3(b_qkv.astype(f32)[None], f32)[0] if b_qkv is not None
               else jnp.zeros((op,), f32))
    p["dw"] = place3(w_dw.reshape(9, 3 * c).astype(f32), f32)
    p["db"] = (place3(b_dw.astype(f32)[None], f32)[0] if b_dw is not None
               else jnp.zeros((op,), f32))
    p["wp"] = jnp.pad(w_proj.reshape(c, c).astype(bf),
                      ((0, cps - c), (0, cp - c)))
    p["bp"] = (jnp.pad(b_proj.astype(f32), (0, cp - c))
               if b_proj is not None else jnp.zeros((cp,), f32))
    return p


def _pack_params(params, c, cp, cps, hp, hidden, offs, op):
    """Lane-aligned packing for the full Restormer block (front + GDFN)."""
    (ln1w, ln1b, w_qkv, b_qkv, w_dw, b_dw, temp, w_proj, b_proj,
     ln2w, ln2b, w_in, b_in, w_dw2, b_dw2, w_out, b_out) = params
    f32, bf = jnp.float32, jnp.bfloat16
    z = lambda n: jnp.zeros((n,), f32)

    p = pack_front((ln1w, ln1b, w_qkv, b_qkv, w_dw, b_dw, w_proj, b_proj),
                   c, cp, cps, offs, op)
    p["ln2w"] = jnp.pad(ln2w.astype(f32), (0, cp - c))
    p["ln2b"] = (jnp.pad(ln2b.astype(f32), (0, cp - c)) if ln2b is not None
                 else jnp.zeros((cp,), f32))
    # cont|gate packed side by side at [0:hp]|[hp:2hp] (one matmul + one
    # dwconv tap loop in pass 2; both halves granule-aligned)
    wi = w_in.reshape(c, 2 * hidden).astype(bf)
    pad_h = lambda m: jnp.pad(m, ((0, 0), (0, hp - hidden)))
    p["wcg"] = jnp.concatenate(
        [jnp.pad(wi[:, :hidden], ((0, cp - c), (0, hp - hidden))),
         jnp.pad(wi[:, hidden:], ((0, cp - c), (0, hp - hidden)))], axis=1)
    p["bcg"] = (jnp.concatenate(
        [pad_h(b_in[None, :hidden].astype(f32)),
         pad_h(b_in[None, hidden:].astype(f32))], axis=1)[0]
        if b_in is not None else z(2 * hp))
    dw2 = w_dw2.reshape(9, 2 * hidden).astype(f32)
    p["dwcg"] = jnp.concatenate(
        [pad_h(dw2[:, :hidden]), pad_h(dw2[:, hidden:])], axis=1)
    p["dbcg"] = (jnp.concatenate(
        [pad_h(b_dw2[None, :hidden].astype(f32)),
         pad_h(b_dw2[None, hidden:].astype(f32))], axis=1)[0]
        if b_dw2 is not None else z(2 * hp))
    p["wo"] = jnp.pad(w_out.reshape(hidden, c).astype(bf),
                      ((0, hp - hidden), (0, cp - c)))
    p["bo"] = (jnp.pad(b_out.astype(f32), (0, cp - c))
               if b_out is not None else jnp.zeros((cp,), f32))
    return p


# Debug knob, captured ONCE at import: tile-height choices are baked into
# traced/cached programs, so changing the env var mid-process would silently
# have no effect on already-jitted calls. Import-time capture makes that
# explicit — restart the process to change the budget.
_VMEM_BUDGET_MB = int(__import__("os").environ.get("IR_TPU_VMEM_BUDGET_MB", "0"))
_QK_MODE = __import__("os").environ.get("IR_TPU_QK_MODE", "")
_BF16_TAPS = __import__("os").environ.get("IR_TPU_BF16_TAPS", "0") == "1"
# IR_TPU_PIPE=N (N>1): software-pipeline the matmul->9-tap-dwconv sections
# of both passes over N row chunks per tile (MXU/VPU overlap A/B knob).
_PIPE = int(__import__("os").environ.get("IR_TPU_PIPE", "0"))


def _pipe_chunks(th: int) -> int:
    """Effective chunk count for a th-row tile: the largest divisor of th
    that is <= _PIPE (0 = pipelining off, or chunks would be 1 row deep)."""
    if _PIPE <= 1:
        return 0
    p = min(_PIPE, th)
    while th % p:
        p -= 1
    return p if p > 1 and th // p >= 2 else 0


def _pick_th(vmem_of, h):
    if _VMEM_BUDGET_MB:
        return pick_tile_height(h, vmem_of, budget=_VMEM_BUDGET_MB * 1024 * 1024)
    return pick_tile_height(h, vmem_of)


def cur_spec(wp, tt, lanes):
    """Current row-tile block: (1, tt, wp, lanes) at (bi, hi)."""
    return pl.BlockSpec((1, tt, wp, lanes), lambda bi, hi: (bi, hi, 0, 0),
                        memory_space=pltpu.VMEM)


def row_spec(h, off, tt, lanes, wp, rows: int = 1):
    """Halo block of ``rows`` rows at row offset ``off`` (in rows, must be a
    multiple of ``rows``) from the current tile start; clipped at the image
    edge (duplicated rows are annihilated by the kernels' row-validity
    masks). Offsets are expressed in block units of ``rows``."""
    assert off % rows == 0 and tt % rows == 0 and h % rows == 0
    return pl.BlockSpec(
        (1, rows, wp, lanes),
        lambda bi, hi, off=off, tt=tt: (
            bi, jnp.clip(hi * (tt // rows) + off // rows, 0, h // rows - 1),
            0, 0),
        memory_space=pltpu.VMEM)


VSPEC = pl.BlockSpec(memory_space=pltpu.VMEM)


def run_front(xc, pk, *, c, cps, offs, op, qk_lo, qk_hi, span, ss_w,
              ln_bias, eps, width, border: int = 1,
              interpret: bool = False):
    """Pass 1 (LN1 -> qkv -> 3x3 dw -> v canvas + q^T k / sumsq accumulators)
    over a border-``border`` canvas. Shared by the Restormer block
    (``fused_block``) and the DRSformer TKSA front (drs_block_pallas) —
    the two attentions differ only in the finalize step."""
    b, h, wp, cp = xc.shape

    def vmem1(t):
        return ((t + 2) * wp * cp * 2 + (t + 2) * wp * cp * 4
                + (t + 2) * wp * op * 4 + t * width * op * 4
                + t * wp * cps * 2 + span * span * 4)

    th1 = _pick_th(vmem1, h)
    n1 = h // th1
    kern1 = functools.partial(
        _front_kernel, th=th1, width=width, c_real=c, cps=cps, offs=offs,
        qk_lo=qk_lo, qk_hi=qk_hi, ln_bias=ln_bias, eps=eps, h_total=h,
        bf16_taps=_BF16_TAPS, border=border)
    return pl.pallas_call(
        kern1,
        grid=(b, n1),
        in_specs=[row_spec(h, -1, th1, cp, wp), cur_spec(wp, th1, cp),
                  row_spec(h, th1, th1, cp, wp)] + [VSPEC] * 6,
        out_specs=[
            pl.BlockSpec((1, th1, wp, cps), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span, span), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ss_w), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp, cps), xc.dtype),
            jax.ShapeDtypeStruct((b, span, span), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, ss_w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xc, xc, xc, pk["ln1w"], pk["ln1b"], pk["wq"], pk["bq"], pk["dw"],
      pk["db"])


def _reference_block(x, params, num_heads, ln_type, eps, gate=None):
    (ln1w, ln1b, w_qkv, b_qkv, w_dw, b_dw, temp, w_proj, b_proj,
     ln2w, ln2b, w_in, b_in, w_dw2, b_dw2, w_out, b_out) = params
    qkv = _ref_front(x, (ln1w, ln1b, w_qkv, b_qkv, w_dw, b_dw), ln_type, eps,
                     split_pad=True)
    x = _reference_core(qkv, x, temp, w_proj, b_proj, num_heads, gate=gate)
    return _reference_ln_gdfn(
        x, (ln2w, ln2b, w_in, b_in, w_dw2, b_dw2, w_out, b_out), ln_type, eps)


# test hook: run BOTH pass kernels in pallas interpret mode on CPU instead
# of the reference fallback (tests/test_fused_block_pipe.py)
_INTERPRET = False


def _forward(xc, params, cfg, gate=None):
    (c, w, num_heads, ln_type, eps) = cfg
    if jax.default_backend() != "tpu" and not _INTERPRET:
        x = canvas_unpad(xc, w, c)
        out = _reference_block(x, params, num_heads, ln_type, eps, gate=gate)
        return canvas_pad(out)

    b, h, wp, cp = xc.shape
    cps = _round_up(c, 128)
    # (v,q,k) slots packed at stride c when that saves lane granules (c=48:
    # op 384->256; c=192: 768->640), else 128-aligned slots (c=96: 384=384).
    # A GAP variant packing q|k into ONE granule at c<=64 was measured
    # (r4, chained-diff): 2.14 vs 1.82 ms/block at 512^2 c=48 — the narrower
    # Gram does NOT pay for the extra lane offsets; dropped.
    cs = c if _round_up(3 * c, 128) < 3 * cps else cps
    offs = (0, cs, 2 * cs)
    op = _round_up(3 * cs, 128)  # == 3*cps in the aligned case
    # q^T k strategy (static): the relayout-free span dot wins at large
    # spatial grids; per-slot extraction keeps the dot cps-sized and wins at
    # small ones (MoCE-IR's patch/latent blocks). IR_TPU_QK_MODE=span|extract
    # forces one path (A/B knob, captured at import like the VMEM budget).
    use_span = (h * w >= 256 * 256 if not _QK_MODE else _QK_MODE == "span")
    if use_span:
        # granule-aligned lane span covering the q/k slots (cs, 2*cs)
        qk_lo = (cs // 128) * 128
        qk_hi = _round_up(2 * cs + c, 128)
        span = qk_hi - qk_lo
        qo, ko = cs - qk_lo, 2 * cs - qk_lo  # offsets inside the span
        ss_w = span
    else:
        qk_lo = qk_hi = None
        span = cps
        qo, ko = 0, 0
        ss_w = 2 * cps  # q sumsq | k sumsq halves
    hidden = params[11].reshape(c, -1).shape[-1] // 2
    hp = _round_up(hidden, 128)
    ch = c // num_heads
    ln_bias = ln_type != "BiasFree"
    pk = _pack_params(params, c, cp, cps, hp, hidden, offs, op)

    # ---- pass 1 ----
    vmap, prod, sss = run_front(
        xc, pk, c=c, cps=cps, offs=offs, op=op, qk_lo=qk_lo, qk_hi=qk_hi,
        span=span, ss_w=ss_w, ln_bias=ln_bias, eps=eps, width=w,
        interpret=_INTERPRET)

    # ---- finalize: norm rescale + temperature + per-head softmax ----
    temp = params[6]
    if qk_lo is not None:
        qn = jnp.maximum(jnp.sqrt(sss[:, 0, qo : qo + c]), 1e-12)
        kn = jnp.maximum(jnp.sqrt(sss[:, 0, ko : ko + c]), 1e-12)
        logits = (prod[:, qo : qo + c, ko : ko + c]
                  / (qn[:, :, None] * kn[:, None, :]))
    else:
        qn = jnp.maximum(jnp.sqrt(sss[:, 0, :c]), 1e-12)
        kn = jnp.maximum(jnp.sqrt(sss[:, 0, cps : cps + c]), 1e-12)
        logits = prod[:, :c, :c] / (qn[:, :, None] * kn[:, None, :])
    # (heads,1,1) -> (1,heads); per-sample (b,heads) temps (CG-IR context
    # log-temperature) broadcast over the batched logits identically
    tv = temp.reshape(-1, num_heads).astype(jnp.float32)
    afull = jnp.zeros((b, cps, cps), jnp.float32)
    for i in range(num_heads):
        blk = (logits[:, i * ch : (i + 1) * ch, i * ch : (i + 1) * ch]
               * tv[:, i, None, None])
        blk = jax.nn.softmax(blk, axis=-1)
        afull = jax.lax.dynamic_update_slice(afull, blk, (0, i * ch, i * ch))
    at = jnp.swapaxes(afull, 1, 2)
    if gate is not None:
        # per-(batch,channel) output gate applied between attention and
        # project_out: (gate . (A v)) W == v (A^T diag(gate) W) — fold the
        # diagonal into the same per-batch A^T W_proj product, exact.
        gpad = jnp.pad(gate.astype(jnp.float32), ((0, 0), (0, cps - c)))
        at = at * gpad[:, None, :]
    # fold A^T into W_proj once per block (O(C^2) matmul in plain XLA):
    # pass 2 then applies attention+projection as ONE tile matmul. Rows of
    # atw beyond c are zero (afull pad rows x any = 0 after the swap), which
    # annihilates the junk lanes the v canvas carries.
    atw = jnp.einsum("bij,jk->bik", at,
                     pk["wp"].astype(jnp.float32)).astype(xc.dtype)

    # ---- pass 2 ----
    def vmem2(t):
        return ((t + 2) * wp * (cps + cp) * 2
                + (t + 2) * wp * cp * 4              # ao
                + (t + 2) * wp * 2 * hp * 4          # cont|gate merged
                + t * w * 2 * hp * 4                 # tap accumulator
                + t * wp * cp * 4 + cps * cp * 4)

    th2 = _pick_th(vmem2, h)
    n2 = h // th2
    kern2 = functools.partial(
        _apply_gdfn_kernel, th=th2, width=w, c_real=c, hp=hp,
        ln_bias=ln_bias, eps=eps, h_total=h, bf16_taps=_BF16_TAPS)
    out = pl.pallas_call(
        kern2,
        grid=(b, n2),
        in_specs=[row_spec(h, -1, th2, cps, wp), cur_spec(wp, th2, cps),
                  row_spec(h, th2, th2, cps, wp),
                  row_spec(h, -1, th2, cp, wp), cur_spec(wp, th2, cp),
                  row_spec(h, th2, th2, cp, wp),
                  pl.BlockSpec((1, cps, cp), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)] + [VSPEC] * 9,
        out_specs=pl.BlockSpec((1, th2, wp, cp), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, cp), xc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(vmap, vmap, vmap, xc, xc, xc, atw, pk["bp"], pk["ln2w"],
      pk["ln2b"], pk["wcg"], pk["bcg"], pk["dwcg"], pk["dbcg"],
      pk["wo"], pk["bo"])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_block(xc, params, cfg, gate=None):
    """One whole Restormer TransformerBlock on the canvas layout.

    xc: (B, H, WP, CP) canvas from ``canvas_pad``; cfg = (c_real, w_real,
    num_heads, ln_type, eps) static. params = 17-tuple:
    (ln1_w, ln1_b, w_qkv, b_qkv, w_dw, b_dw, temperature, w_proj, b_proj,
     ln2_w, ln2_b, w_in, b_in, w_dw2, b_dw2, w_out, b_out).
    temperature may be (heads, 1, 1) or per-sample (b, heads).
    gate: optional (b, c) per-channel attention output gate (applied before
    project_out — CG-IR's Context_Adaptive_Gated_Attention, folded into the
    per-batch A^T W_proj product at zero kernel cost).
    Returns the next block's canvas.
    """
    return _forward(xc, params, cfg, gate)


def _fwd(xc, params, cfg, gate):
    return _forward(xc, params, cfg, gate), (xc, params, gate)


def _bwd(cfg, res, g):
    (c, w, num_heads, ln_type, eps) = cfg
    xc, params, gate = res

    if gate is None:
        def ref(xcc, pp):
            x = canvas_unpad(xcc, w, c)
            return canvas_pad(_reference_block(x, pp, num_heads, ln_type, eps))

        _, vjp = jax.vjp(ref, xc, params)
        return vjp(g) + (None,)

    def ref_g(xcc, pp, gg):
        x = canvas_unpad(xcc, w, c)
        return canvas_pad(
            _reference_block(x, pp, num_heads, ln_type, eps, gate=gg))

    _, vjp = jax.vjp(ref_g, xc, params, gate)
    return vjp(g)


fused_block.defvjp(_fwd, _bwd)
