"""MEFC (DRSformer's mixture-of-experts feature compensator,
DRSformer_arch.py:189-353) fused: one Pallas pass per op-mixture step.

A Subnet runs ``steps=4`` residual op-mixture steps; each step applies an
8-op bank to the same input and mixes with GAP-predicted per-sample
softmax weights:

  SepConv(k)   k in {1,3,5,7}: dw_k -> 1x1 -> relu -> dw_k -> 1x1
  DilConv(k)   k in {3,5,7}:   dilation-2 dw_k -> 1x1
  AvgPool 3x3  (count_include_pad=False)

then concat -> 1x1 -> relu, +residual, relu. Plain XLA ships each op's
output and intermediates as full HBM tensors — measured 51 ms per Subnet
at 512^2 x 96 (tools/profile_drsformer.py) vs a ~13 ms VPU tap floor.

The fused step kernel reads one row tile of a border-6 canvas and keeps
every intermediate in VMEM:

  * each op's trailing 1x1(s) and its concat-1x1 column block are folded
    with the per-sample mix weight into ONE per-batch (cp, cp) matrix
    M_op = w_op * W_last_op @ Wcat_op (computed in plain XLA per step,
    like the fused block's A^T W_proj fold) — so an op is taps [-> 1x1
    -> relu -> taps] -> M_op, accumulated in fp32;
  * the pool's position-dependent divisor (count_include_pad=False) is
    computed arithmetically from row/col indices, no mask convolution;
  * out = relu(relu(sum) + x) written back to the canvas.

Everything is bias-free in the reference (all convs bias=False), so
out-of-image positions stay exactly zero through relu/matmul chains and
only the input needs masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_restoration_tpu.kernels.block_pallas import (
    VSPEC,
    cur_spec,
    row_spec,
)
from image_restoration_tpu.kernels.gdfn_pallas import _round_up

BORDER = 6   # column halo: SepConv7 (3+3) / DilConv7 (2*3)
H0 = 8       # row halo blocks: two 4-row blocks per side (>= 6 needed)

SEP_KS = (1, 3, 5, 7)
DIL_KS = (3, 5, 7)

# A/B knobs (import-time): IR_MEFC_F32=1 keeps the folded mix matrices and
# the op->mix matmul operands in fp32 (3-pass MXU on ~12 c^2 matmuls/px);
# IR_MEFC_TH forces the step-kernel tile height.
_F32_MIX = __import__("os").environ.get("IR_MEFC_F32", "0") == "1"
_FORCE_TH = int(__import__("os").environ.get("IR_MEFC_TH", "0"))
# IR_MEFC_ONLY=sep|dil|pool|sep7|... : profile knob — keep only the named
# branch(es, comma-separated) in the step kernel. WRONG RESULTS; timing only.
_ONLY = tuple(f for f in __import__("os").environ.get(
    "IR_MEFC_ONLY", "").split(",") if f)


def _branch_on(name):
    return not _ONLY or any(name.startswith(o) or o.startswith(name)
                            for o in _ONLY)


def mefc_canvas_pad(x, lanes: int = 128):
    b, h, w, c = x.shape
    wp = _round_up(w + 2 * BORDER, 16)
    cp = _round_up(c, lanes)
    return jnp.pad(x, ((0, 0), (0, 0), (BORDER, wp - w - BORDER),
                       (0, cp - c)))


def mefc_canvas_unpad(xc, w, c):
    return xc[:, :, BORDER : BORDER + w, :c]


def _avg_pool3x3_exclude_pad(x):
    ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(jnp.broadcast_to(ones, ones.shape), 0.0,
                                jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


def _reference_steps(x, raw_steps, weights):
    """Plain-XLA composition of the op-mixture steps from raw params (the
    exact math the kernel fuses) — backward pass + CPU execution. Mirrors
    models/drsformer.OperationLayer numerics."""
    from image_restoration_tpu.ops.common import _dwconv_taps

    c = x.shape[-1]
    dt = x.dtype

    def mm(t, kern):
        return jnp.einsum("bhwc,cd->bhwd", t, kern.reshape(
            kern.shape[-2], kern.shape[-1]).astype(t.dtype),
            preferred_element_type=jnp.float32).astype(t.dtype)

    for st, sp in enumerate(raw_steps):
        outs = []
        for i, k in enumerate(SEP_KS):
            p = sp["sep"][i]
            t = _dwconv_taps(x, p["dwa"].astype(dt), k // 2)
            t = jax.nn.relu(mm(t, p["w1"]))
            t = _dwconv_taps(t, p["dwb"].astype(dt), k // 2)
            outs.append(mm(t, p["w2"]))
        for i, k in enumerate(DIL_KS):
            p = sp["dil"][i]
            t = _dwconv_taps(x, p["dw"].astype(dt), k - 1, dilation=2)
            outs.append(mm(t, p["w1"]))
        outs.append(_avg_pool3x3_exclude_pad(x))
        states = [o * weights[:, st, i].reshape(-1, 1, 1, 1).astype(o.dtype)
                  for i, o in enumerate(outs)]
        cat = jnp.concatenate(states, axis=-1)
        mixed = jax.nn.relu(mm(cat, sp["wcat"]))
        x = jax.nn.relu(mixed + x)
    return x


def _step_kernel(xp2_ref, xp1_ref, xc_ref, xn1_ref, xn2_ref,
                 w1_ref, dwa_ref, dwb_ref, dwd_ref, m_ref, o_ref,
                 *, th: int, width: int, c_real: int, h_total: int,
                 sep_off: tuple, dil_off: tuple):
    """One op-mixture step on one row tile.

    w1:  (4, cp, cp)  SepConv inner 1x1s (k = 1,3,5,7 order)
    dwa: (84, cp)     SepConv first dw banks, flattened taps at offsets
                      ``sep_off`` (1+9+25+49 = 84 rows)
    dwb: (84, cp)     SepConv second dw banks
    dwd: (83, cp)     DilConv dw banks (9+25+49 rows), dilation 2
    m:   (1, 8, cp, cp) per-batch folded mix matrices, op order
                      (sep1, sep3, sep5, sep7, dil3, dil5, dil7, pool)
    """
    wp = xc_ref.shape[2]
    cp = xc_ref.shape[-1]
    hi = pl.program_id(1)
    thh = th + 2 * H0
    prec = jax.lax.Precision.DEFAULT

    xs = jnp.concatenate([xp2_ref[0], xp1_ref[0], xc_ref[0], xn1_ref[0],
                          xn2_ref[0]], axis=0).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (thh, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (thh, wp), 1)
    grow = rows + hi * th - H0
    valid = ((grow >= 0) & (grow < h_total) & (cols >= BORDER)
             & (cols < BORDER + width))
    x = xs * valid.astype(jnp.float32)[:, :, None]

    out = jnp.zeros((th * width, cp), jnp.float32)
    mcast = (lambda t: t) if _F32_MIX else (
        lambda t: t.astype(jnp.bfloat16))

    # --- SepConv ops: dw_k -> 1x1 -> relu -> dw_k -> M_op ---
    # t1 computed over (th+6) rows x (width+6) cols: t1[j, m] sits at
    # canvas (row hi*th - 3 + j, col BORDER - 3 + m) — enough halo for any
    # second dw (r <= 3). Its taps read x at local (H0-3-r+t+j,
    # BORDER-3-r+s+m).
    # t1 is an IMAGE-sized tensor in the reference: the second dw
    # zero-pads it, so out-of-image t1 positions (whose tap windows still
    # overlap the image) must be masked to zero.
    t1rows = jax.lax.broadcasted_iota(jnp.int32, (th + 6, width + 6), 0)
    t1cols = jax.lax.broadcasted_iota(jnp.int32, (th + 6, width + 6), 1)
    t1grow = t1rows + hi * th - 3
    t1mask = (((t1grow >= 0) & (t1grow < h_total) & (t1cols >= 3)
               & (t1cols < 3 + width))
              .astype(jnp.float32)[:, :, None])
    for i, k in enumerate(SEP_KS):
        if not _branch_on(f"sep{k}"):
            continue
        r = k // 2
        off = sep_off[i]
        acc1 = None
        for t in range(k):
            for s in range(k):
                sl = x[H0 - 3 - r + t : H0 - 3 - r + t + th + 6,
                       BORDER - 3 - r + s
                       : BORDER - 3 - r + s + width + 6, :]
                term = sl * dwa_ref[off + t * k + s]
                acc1 = term if acc1 is None else acc1 + term
        t1 = mcast(jnp.maximum(
            jnp.dot(mcast(acc1.reshape((th + 6) * (width + 6), cp)),
                w1_ref[i],
                preferred_element_type=jnp.float32, precision=prec),
            0.0).reshape(th + 6, width + 6, cp) * t1mask)
        acc2 = None
        for t in range(k):
            for s in range(k):
                sl = t1[3 - r + t : 3 - r + t + th,
                        3 - r + s : 3 - r + s + width, :]
                term = sl * dwb_ref[off + t * k + s]
                acc2 = term if acc2 is None else acc2 + term
        out = out + jnp.dot(
            mcast(acc2.reshape(th * width, cp)), m_ref[0, i],
            preferred_element_type=jnp.float32, precision=prec)

    # --- DilConv ops: dilation-2 dw_k -> M_op ---
    for i, k in enumerate(DIL_KS):
        if not _branch_on(f"dil{k}"):
            continue
        r = k // 2
        off = dil_off[i]
        accd = None
        for t in range(k):
            for s in range(k):
                sl = x[H0 - 2 * r + 2 * t : H0 - 2 * r + 2 * t + th,
                       BORDER - 2 * r + 2 * s
                       : BORDER - 2 * r + 2 * s + width, :]
                term = sl * dwd_ref[off + t * k + s]
                accd = term if accd is None else accd + term
        out = out + jnp.dot(
            mcast(accd.reshape(th * width, cp)), m_ref[0, 4 + i],
            preferred_element_type=jnp.float32, precision=prec)

    # --- AvgPool 3x3, count_include_pad=False ---
    if _branch_on("pool"):
        psum = None
        for t in range(3):
            for s in range(3):
                sl = x[H0 - 1 + t : H0 - 1 + t + th,
                       BORDER - 1 + s : BORDER - 1 + s + width, :]
                psum = sl if psum is None else psum + sl
        orow = (jax.lax.broadcasted_iota(jnp.int32, (th, width), 0)
                + hi * th)
        ocol = jax.lax.broadcasted_iota(jnp.int32, (th, width), 1)
        cnt_r = (jnp.minimum(orow + 1, h_total - 1)
                 - jnp.maximum(orow - 1, 0) + 1)
        cnt_c = (jnp.minimum(ocol + 1, width - 1)
                 - jnp.maximum(ocol - 1, 0) + 1)
        cnt = (cnt_r * cnt_c).astype(jnp.float32)[:, :, None]
        out = out + jnp.dot(
            mcast((psum / cnt).reshape(th * width, cp)),
            m_ref[0, 7], preferred_element_type=jnp.float32, precision=prec)

    res = x[H0 : H0 + th, BORDER : BORDER + width, :]
    fin = jnp.maximum(jnp.maximum(out.reshape(th, width, cp), 0.0) + res,
                      0.0)
    o_ref[0] = jnp.zeros((th, wp, cp), o_ref.dtype)
    o_ref[0, :, BORDER : BORDER + width, :] = fin.astype(o_ref.dtype)


def _sep_offsets():
    offs, o = [], 0
    for k in SEP_KS:
        offs.append(o)
        o += k * k
    return tuple(offs), o


def _dil_offsets():
    offs, o = [], 0
    for k in DIL_KS:
        offs.append(o)
        o += k * k
    return tuple(offs), o


def _pack_step(step_params, c, cp):
    """step_params: dict with per-op raw tensors (see _reference_subnet).
    Returns (w1 (4,cp,cp) bf16, dwa (84,cp) f32, dwb (84,cp) f32,
    dwd (83,cp) f32, last (8, c, c) fp32 — W_last_op @ Wcat_op, UNmixed)."""
    f32, bf = jnp.float32, jnp.bfloat16
    sep_off, ntap = _sep_offsets()
    dil_off, ntapd = _dil_offsets()
    w1 = jnp.zeros((4, cp, cp), f32 if _F32_MIX else bf)
    dwa = jnp.zeros((ntap, cp), f32)
    dwb = jnp.zeros((ntap, cp), f32)
    dwd = jnp.zeros((ntapd, cp), f32)
    lasts = []
    wcat = step_params["wcat"].reshape(8 * c, c)  # concat 1x1
    for i, k in enumerate(SEP_KS):
        p = step_params["sep"][i]
        w1 = w1.at[i, :c, :c].set(p["w1"].reshape(c, c).astype(
            w1.dtype))
        dwa = dwa.at[sep_off[i] : sep_off[i] + k * k, :c].set(
            p["dwa"].reshape(k * k, c).astype(f32))
        dwb = dwb.at[sep_off[i] : sep_off[i] + k * k, :c].set(
            p["dwb"].reshape(k * k, c).astype(f32))
        lasts.append(p["w2"].reshape(c, c).astype(f32)
                     @ wcat[i * c : (i + 1) * c].astype(f32))
    for i, k in enumerate(DIL_KS):
        p = step_params["dil"][i]
        dwd = dwd.at[dil_off[i] : dil_off[i] + k * k, :c].set(
            p["dw"].reshape(k * k, c).astype(f32))
        lasts.append(p["w1"].reshape(c, c).astype(f32)
                     @ wcat[(4 + i) * c : (5 + i) * c].astype(f32))
    lasts.append(wcat[7 * c : 8 * c].astype(f32))  # pool: identity @ Wcat
    return w1, dwa, dwb, dwd, jnp.stack(lasts)  # (8, c, c)


def _forward(x, raw_steps, weights, interpret: bool = False):
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not interpret:
        return _reference_steps(x, raw_steps, weights)
    b, h, w, c = x.shape
    gran = 128 if on_tpu else 8
    cp = _round_up(c, gran)
    xc = mefc_canvas_pad(x, lanes=gran)
    steps_params = [_pack_step(sp, c, cp) for sp in raw_steps]
    xc = _run_steps(xc, steps_params, weights, c, w, h,
                    interpret=interpret and not on_tpu)
    return mefc_canvas_unpad(xc, w, c)


@jax.custom_vjp
def fused_mefc_steps(x, raw_steps, weights):
    """The Subnet's residual op-mixture steps, one fused Pallas pass per
    step on TPU (reference composition elsewhere / for gradients).

    x: (B, H, W, C) unpadded state after the preprocess conv; raw_steps:
    list (one per step) of {"sep": [{dwa, w1, dwb, w2}] x4 (k=1,3,5,7),
    "dil": [{dw, w1}] x3 (k=3,5,7), "wcat": (1,1,8C,C)}; weights:
    (B, steps, 8) softmaxed per-sample mix."""
    return _forward(x, raw_steps, weights)


def _fwd(x, raw_steps, weights):
    return _forward(x, raw_steps, weights), (x, raw_steps, weights)


def _bwd(res, g):
    x, raw_steps, weights = res
    _, vjp = jax.vjp(_reference_steps, x, raw_steps, weights)
    return vjp(g)


fused_mefc_steps.defvjp(_fwd, _bwd)


def _run_steps(xc, steps_params, weights, c, w, h, interpret: bool = False):
    """Run packed steps on a border-6 canvas."""
    b, hh, wp, cp = xc.shape
    sep_off, _ = _sep_offsets()
    dil_off, _ = _dil_offsets()
    cand = [t for t in range(4, min(h, 64) + 1, 4) if h % t == 0]
    if not cand:
        raise ValueError(f"h={h} has no 4-aligned tile")

    def vmem(t):
        # x + the live Sep-branch buffers; Mosaic's scoped-stack allocator
        # keeps ~3.5x this (measured: est 34 MB -> 126 MB OOM at th=16,
        # 512^2 c=96), hence the fudge below
        return ((t + 2 * H0) * wp * cp * (2 + 4)
                + 2 * (t + 6) * (w + 6) * cp * 4   # t1 + tap acc
                + t * w * cp * 4 * 2 + 4 * cp * cp * 2 + 8 * cp * cp * 4)

    under = [t for t in cand if vmem(t) * 3.5 <= 90 * 1024 * 1024]
    th = max(under) if under else cand[0]
    if _FORCE_TH and h % _FORCE_TH == 0 and _FORCE_TH % 4 == 0:
        th = _FORCE_TH
    kern = functools.partial(
        _step_kernel, th=th, width=w, c_real=c, h_total=h,
        sep_off=sep_off, dil_off=dil_off)

    for st, (w1, dwa, dwb, dwd, last) in enumerate(steps_params):
        # fold the per-sample mix weight into the (8, c, c) last matrices
        m = jnp.einsum("bo,oij->boij", weights[:, st].astype(jnp.float32),
                       last)
        m = jnp.pad(m, ((0, 0), (0, 0), (0, cp - c), (0, cp - c)))
        if not _F32_MIX:
            m = m.astype(jnp.bfloat16)
        xc = pl.pallas_call(
            kern,
            grid=(b, h // th),
            in_specs=[row_spec(h, -H0, th, cp, wp, rows=4),
                      row_spec(h, -4, th, cp, wp, rows=4),
                      cur_spec(wp, th, cp),
                      row_spec(h, th, th, cp, wp, rows=4),
                      row_spec(h, th + 4, th, cp, wp, rows=4),
                      VSPEC, VSPEC, VSPEC, VSPEC,
                      pl.BlockSpec((1, 8, cp, cp),
                                   lambda bi, hi: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, wp, cp),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hh, wp, cp), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xc, xc, xc, xc, xc, w1, dwa, dwb, dwd, m)
    return xc
