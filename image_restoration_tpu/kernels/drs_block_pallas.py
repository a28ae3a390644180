"""Whole-DRSformer-TransformerBlock Pallas fusion: two HBM passes per block.

The DRSformer block (DRSformer_arch.py:101-186) is Restormer-shaped:

  x = x + TKSA(LN1(x));  x = x + MSFN(LN2(x))

and measured plain-XLA (tools/profile_msfn.py, 512^2 c=96 bf16) it costs
~48 ms/block of which the MSFN alone is 30-41 ms — ~8x over its VPU tap
floor, all XLA materialization of 134-268 MB intermediates. This module
extends the whole-block canvas fusion of kernels/block_pallas to the
DRSformer block:

  Pass 1 IS block_pallas._front_kernel (shared code): LN1 -> qkv 1x1 (MXU)
  -> 3x3 depthwise -> v canvas + accumulated q^T k / sum-of-squares. TKSA
  (DRSformer_arch.py:101-173) has the same front as MDTA; only the finalize
  differs: per-head logits are top-k masked at four sparsity levels
  (C/2, 2C/3, 3C/4, 4C/5), softmaxed, and mixed by learnable scalars
  attn1..attn4 — all O(heads * ch^2) plain XLA on the tiny gram matrix,
  then folded into A^T W_proj exactly like the Restormer path.

  Pass 2 fuses attention-apply + LN2 + MSFN (DRSformer_arch.py:62-99) in
  the interleave-free slot layout of ``_msfn_slots`` (per-path or
  joint-path packing, picked by static VPU tap cost — joint halves the
  pad waste at small hidden, e.g. dim=48's hidden=127 at the 128 lane
  granule):
    ao = x + v @ (A^T W_proj) + b          (one MXU matmul, th+8 rows)
    LN2 -> project_in with GATHERED columns -> u in slot order (MXU)
    stage 1: 9-tap 3x3 bank over the k3 region, 25-tap 5x5 bank over the
      k5 region (mixed-group slots carry zero-padded 3x3 kernels) -> relu
    stage 2: four tap groups (per path/bank) + A/B pair sums -> relu
    project_out with gathered rows: four (ln x C) matmuls accumulated
    + bias + ao residual -> canvas tile out.

The canvas uses a 4-column border (canvas_pad(border=4)) so both 5x5
stages' column halos stay in-bounds with zero masking only (no in-kernel
pads/relayouts); rows use 4-row halo blocks recomputed locally (th % 4
== 0). Backward = custom VJP recomputing the plain-XLA composition (exact
gradients); non-TPU backends run the reference composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_restoration_tpu.kernels.block_pallas import (
    VSPEC,
    canvas_pad,
    canvas_unpad,
    cur_spec,
    pack_front,
    row_spec,
    run_front,
)
from image_restoration_tpu.kernels.gdfn_pallas import _round_up

BORDER = 4
HALO = 4  # rows recomputed each side in pass 2 (two 5x5 stages)
# A/B knobs, captured at import (baked into traced programs — restart to
# change): IR_DRS_TH forces the pass-2 tile height; IR_DRS_BF16=0 keeps
# u/d3/d5 in fp32 (more VMEM -> smaller tiles). bf16 storage + th=8
# measured fastest at 512^2 c=96 (see tools/ab_drs_block.py).
_FORCE_TH = int(__import__("os").environ.get("IR_DRS_TH", "0"))
_BF16_STORE = __import__("os").environ.get("IR_DRS_BF16", "1") == "1"
VMEM_SOFT = 56 * 1024 * 1024  # soft tile-height budget (pass 2 is
# compute-bound: larger tiles cut the 2r-row halo recompute, worth more
# than double-buffer headroom here, unlike the traffic-bound GDFN kernel)


# ------------------------------------------------------------- reference ---

def _ln(x, w, b, eps, ln_type):
    xf = x.astype(jnp.float32)
    var = jnp.var(xf, axis=-1, keepdims=True)
    if ln_type == "BiasFree":
        y = xf * jax.lax.rsqrt(var + eps) * w
    else:
        y = (xf - jnp.mean(xf, axis=-1, keepdims=True)) * jax.lax.rsqrt(
            var + eps) * w + b
    return y.astype(x.dtype)


def _reference_drs_block(x, params, cfg):
    """Plain-XLA composition of TKSA + MSFN (the exact math the kernels
    fuse) — used for the backward pass, CPU execution, and tests. Mirrors
    models/drsformer.TKSA/MSFN numerics on the raw param tensors."""
    (c, _w, num_heads, ln_type, eps) = cfg
    (ln1w, ln1b, wq, bq, wd, bd, temp, mix, wo, bo,
     ln2w, ln2b, ki, bi, k3b, b3b, k5b, b5b, s3b, sb3, s5b, sb5,
     kp, bp) = params
    from image_restoration_tpu.ops.attention import normalized_channel_logits
    from image_restoration_tpu.ops.common import _dwconv_taps

    b_, h, w, _ = x.shape
    ch = c // num_heads
    dt = x.dtype

    def conv1x1(t, kern, bias):
        out = jnp.einsum("bhwc,cd->bhwd", t,
                         kern.reshape(kern.shape[-2], kern.shape[-1]).astype(
                             t.dtype),
                         preferred_element_type=jnp.float32).astype(t.dtype)
        return out if bias is None else out + bias.astype(t.dtype)

    # depthwise convs as shifted-FMA taps everywhere: a raw grouped conv
    # with 1-channel groups pads each group to a full lane tile on TPU
    # (16 GB HLO temp at 256^2 x 510) — taps are exact and stream once.
    # --- TKSA ---
    y = _ln(x, ln1w, ln1b, eps, ln_type)
    qkv = conv1x1(y, wq, bq)
    qkv = _dwconv_taps(qkv, wd.astype(dt), 1)
    if bd is not None:
        qkv = qkv + bd.astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(b_, h * w, num_heads, ch)
    kh = k.reshape(b_, h * w, num_heads, ch)
    vt = v.reshape(b_, h * w, num_heads, ch)
    logits = normalized_channel_logits(qh, kh)
    logits = logits * temp.reshape(1, num_heads, 1, 1).astype(jnp.float32)
    attn_sum = 0.0
    for i, frac in enumerate((1 / 2, 2 / 3, 3 / 4, 4 / 5)):
        kk = int(ch * frac)
        thresh = jax.lax.top_k(logits, kk)[0][..., -1:]
        masked = jnp.where(logits >= thresh, logits, -jnp.inf)
        attn = jax.nn.softmax(masked, axis=-1)
        attn_sum = attn_sum + attn * mix[i].astype(jnp.float32)
    out = jnp.einsum("bhcd,bnhd->bnhc", attn_sum.astype(dt), vt,
                     preferred_element_type=jnp.float32).astype(dt)
    out = out.reshape(b_, h, w, c)
    x = x + conv1x1(out, wo, bo)

    # --- MSFN ---
    y = _ln(x, ln2w, ln2b, eps, ln_type)
    hidden = ki.shape[-1] // 2
    u = conv1x1(y, ki, bi)
    d3 = _dwconv_taps(u, k3b.astype(dt), 1)
    if b3b is not None:
        d3 = d3 + b3b.astype(dt)
    d5 = _dwconv_taps(u, k5b.astype(dt), 2)
    if b5b is not None:
        d5 = d5 + b5b.astype(dt)
    d3, d5 = jax.nn.relu(d3), jax.nn.relu(d5)
    x13, x23 = jnp.split(d3, 2, axis=-1)
    x15, x25 = jnp.split(d5, 2, axis=-1)

    def grouped2(a, bb, kern, bias, k):
        # grouped conv (2 in-channels/group) over concat([a, bb]): group g
        # reads concat channels (2g, 2g+1) — the even/odd interleaves of
        # the concat, built directly from the halves (exact identity;
        # odd H swaps bb's parity)
        hh = a.shape[-1]
        if hh % 2 == 0:
            even = jnp.concatenate([a[..., 0::2], bb[..., 0::2]], axis=-1)
            odd = jnp.concatenate([a[..., 1::2], bb[..., 1::2]], axis=-1)
        else:
            even = jnp.concatenate([a[..., 0::2], bb[..., 1::2]], axis=-1)
            odd = jnp.concatenate([a[..., 1::2], bb[..., 0::2]], axis=-1)
        kern = kern.astype(a.dtype)
        out = (_dwconv_taps(even, kern[:, :, 0:1, :], k // 2)
               + _dwconv_taps(odd, kern[:, :, 1:2, :], k // 2))
        return out if bias is None else out + bias.astype(a.dtype)

    s0 = grouped2(x13, x15, s3b, sb3, 3)
    s1 = grouped2(x23, x25, s5b, sb5, 5)
    ffn = conv1x1(jnp.concatenate([jax.nn.relu(s0), jax.nn.relu(s1)],
                                  axis=-1), kp, bp)
    return x + ffn


# ----------------------------------------------------------------- layout ---

def _msfn_slots(hidden: int, part: int = 128):
    """Slot layout for the MSFN kernel, per-slot general form.

    Each MSFN stage-2 group g of path p reads concat channels (2g, 2g+1)
    of [d3-half_p | d5-half_p]; a slot is one (group, operand) pair placed
    in an A or B stream so the pair-sum is two aligned lane blocks. Slots
    are grouped into a k3 region (stage-1 3x3 bank) and a k5 region
    (stage-1 5x5 bank; groups with any d5-sourced operand live here, their
    d3-sourced operand's 3x3 kernel zero-padded to 5x5 = ``promote``).

    Two packings, chosen by VPU tap cost:
      per-path: each (path, region) A/B stream padded to ``part``
        separately — four stage-2 groups with uniform stage-2 banks.
      joint: both paths share one stream per region (half the pad waste
        when len < part, e.g. hidden=127 at part=128) — two stage-2
        groups running 5x5 taps with per-slot banks (path-0 slots carry
        zero-padded 3x3 stage-2 kernels).

    Returns dict: src/valid/bch/promote (S,), n3, and ``groups`` — each
    {region, off (lanes into region), ln, k, tap/g/half/s2k (2ln,)}.
    """
    import numpy as np

    H = hidden
    pad_to = lambda n: ((n + part - 1) // part) * part

    def path_groups(path):
        pure3, rest = [], []
        for g in range(H):
            if 2 * g + 1 < H:
                pure3.append(g)
            else:
                rest.append(g)  # pure5 + the odd-H mixed group
        return pure3, rest

    def slot(path, g, operand):
        # operand 0 -> concat index 2g, 1 -> 2g+1
        i = 2 * g + operand
        base = H * path
        ch = base + i if i < H else base + i - H
        return dict(src=ch, bch=ch, d3=i < H, promote=False,
                    tap=operand, g=g, half=path,
                    s2k=3 if path == 0 else 5, valid=True)

    PADS = dict(src=0, bch=0, d3=True, promote=False, tap=0, g=-1, half=0,
                s2k=3, valid=False)

    def build(joint: bool):
        regions = {"3": [], "5": []}  # list of (A_slots, B_slots, meta)
        for path in (0, 1):
            pure3, rest = path_groups(path)
            a3 = [slot(path, g, 0) for g in pure3]
            b3 = [slot(path, g, 1) for g in pure3]
            a5 = [slot(path, g, 0) for g in rest]
            b5 = [slot(path, g, 1) for g in rest]
            # a d3-sourced operand in the k5 region rides the 5x5 stage-1
            # bank with its 3x3 kernel zero-padded (exact)
            for s in a5 + b5:
                if s["d3"]:
                    s["promote"] = True
            regions["3"].append((a3, b3))
            regions["5"].append((a5, b5))

        slots, groups, region_off = [], [], {}
        for region in ("3", "5"):
            region_off[region] = len(slots)
            off = 0
            paths = regions[region]
            if joint:
                A = paths[0][0] + paths[1][0]
                B = paths[0][1] + paths[1][1]
                ln = pad_to(len(A))
                A += [dict(PADS)] * (ln - len(A))
                B += [dict(PADS)] * (ln - len(B))
                k = max((s["s2k"] for s in A + B if s["valid"]), default=3)
                groups.append(dict(region=region, off=0, ln=ln, k=k,
                                   A=A, B=B))
                slots += A + B
            else:
                for A, B in paths:
                    ln = pad_to(len(A))
                    A = A + [dict(PADS)] * (ln - len(A))
                    B = B + [dict(PADS)] * (ln - len(B))
                    k = max((s["s2k"] for s in A + B if s["valid"]),
                            default=3)
                    groups.append(dict(region=region, off=off, ln=ln, k=k,
                                       A=A, B=B))
                    slots += A + B
                    off += 2 * ln
        n3 = region_off["5"]
        return slots, groups, n3

    def cost(slots, groups, n3):
        n5 = len(slots) - n3
        vpu = 9 * n3 + 25 * n5
        vpu += sum(g["k"] ** 2 * 2 * g["ln"] for g in groups)
        return vpu + 0.1 * len(slots)  # small matmul/VMEM tiebreak

    cands = [build(False), build(True)]
    slots, groups, n3 = min(cands, key=lambda t: cost(*t))

    arr = lambda key, dt: np.array([s[key] for s in slots], dt)
    out = dict(src=arr("src", np.int32), bch=arr("bch", np.int32),
               valid=arr("valid", bool), promote=arr("promote", bool),
               n3=n3)
    out["groups"] = [
        dict(region=g["region"], off=g["off"], ln=g["ln"], k=g["k"],
             tap=np.array([s["tap"] for s in g["A"] + g["B"]], np.int32),
             g=np.array([s["g"] for s in g["A"] + g["B"]], np.int32),
             half=np.array([s["half"] for s in g["A"] + g["B"]], np.int32),
             s2k=np.array([s["s2k"] for s in g["A"] + g["B"]], np.int32))
        for g in groups]
    return out


# ---------------------------------------------------------------- packing ---

def _pack_msfn(msfn, c, cp, hidden, part: int = 128):
    """MSFN weights in the slot layout (``_msfn_slots``): gathered
    project_in columns / project_out rows, per-region stage-1 tap banks
    (promoted mixed-group slots carry zero-padded 3x3 kernels), and the
    stage-2 groups' per-slot tap banks. All numpy-indexed gathers happen
    here, once per block, in plain XLA."""
    import numpy as np

    (ln2w, ln2b, ki, bi, k3b, b3b, k5b, b5b, s3b, sb3, s5b, sb5,
     kp, bp) = msfn
    f32, bf = jnp.float32, jnp.bfloat16
    lay = _msfn_slots(hidden, part=part)
    n3 = lay["n3"]
    S = lay["src"].shape[0]
    n5 = S - n3
    valid = lay["valid"]
    src = lay["src"]
    bch = lay["bch"]
    promote = lay["promote"]
    H = hidden

    p = {}
    p["ln2w"] = jnp.pad(ln2w.astype(f32), (0, cp - c))
    p["ln2b"] = (jnp.pad(ln2b.astype(f32), (0, cp - c)) if ln2b is not None
                 else jnp.zeros((cp,), f32))

    wi = ki.reshape(c, 2 * H)
    p["w_in"] = jnp.pad(
        jnp.where(jnp.asarray(valid)[None, :], wi[:, src], 0.0),
        ((0, cp - c), (0, 0))).astype(bf)
    p["b_in"] = (jnp.where(jnp.asarray(valid), bi[src], 0.0).astype(f32)
                 if bi is not None else jnp.zeros((S,), f32))

    # stage-1 banks: (taps, lanes) fp32. k5 region: promoted slots get the
    # 3x3 kernel zero-padded to 5x5 (rows/cols 1..3 of the 5x5 grid).
    vm3 = jnp.asarray(valid[:n3], f32)
    vm5 = jnp.asarray(valid[n3:], f32)
    k3r = k3b.reshape(9, 2 * H)
    k5r = k5b.reshape(25, 2 * H)
    p["dw3"] = k3r[:, bch[:n3]].astype(f32) * vm3
    pad33 = jnp.pad(k3b, ((1, 1), (1, 1), (0, 0), (0, 0))).reshape(25, 2 * H)
    pr5 = jnp.asarray(promote[n3:])
    dw5 = jnp.where(pr5[None, :], pad33[:, bch[n3:]], k5r[:, bch[n3:]])
    p["dw5"] = dw5.astype(f32) * vm5
    if b3b is not None:
        p["b1_3"] = jnp.where(jnp.asarray(valid[:n3]), b3b[bch[:n3]],
                              0.0).astype(f32)
        p["b1_5"] = jnp.where(
            jnp.asarray(valid[n3:]),
            jnp.where(pr5, b3b[bch[n3:]], b5b[bch[n3:]]), 0.0).astype(f32)
    else:
        p["b1_3"] = jnp.zeros((n3,), f32)
        p["b1_5"] = jnp.zeros((n5,), f32)

    # stage-2 groups: per-slot tap banks gathered from (3,3,2,H)/(5,5,2,H);
    # slots whose stage-2 bank is 3x3 inside a k=5 group (joint packing)
    # carry zero-padded kernels. A-stream ids pick bias + w_out rows.
    wpo = kp.reshape(2 * H, c)
    s3p = jnp.pad(s3b, ((1, 1), (1, 1), (0, 0), (0, 0)))  # 3x3 -> 5x5
    groups = []
    for gm in lay["groups"]:
        k, ln = gm["k"], gm["ln"]
        tap = gm["tap"]
        gid = np.maximum(gm["g"], 0)
        ok = jnp.asarray(gm["g"] >= 0, f32)
        if k == 3:
            bank = s3b.reshape(9, 2, H)
            kg = bank[:, tap, gid].astype(f32) * ok
        else:
            b3 = s3p.reshape(25, 2, H)[:, tap, gid]
            b5 = s5b.reshape(25, 2, H)[:, tap, gid]
            kg = jnp.where(jnp.asarray(gm["s2k"] == 3)[None, :], b3,
                           b5).astype(f32) * ok
        g_a, half_a = gm["g"][:ln], gm["half"][:ln]
        ok_a = jnp.asarray(g_a >= 0, f32)
        ga = np.maximum(g_a, 0)
        if sb3 is not None:
            sbank = jnp.stack([sb3, sb5])  # (2, H)
            sb = sbank[half_a, ga].astype(f32) * ok_a
        else:
            sb = jnp.zeros((ln,), f32)
        wo = jnp.pad(wpo[ga + half_a * H] * ok_a[:, None],
                     ((0, 0), (0, cp - c))).astype(bf)
        groups.append(dict(region=gm["region"], off=gm["off"], ln=ln, k=k,
                           kg=kg, sb=sb, wo=wo))
    p["groups"] = groups
    p["bo"] = (jnp.pad(bp.astype(f32), (0, cp - c)) if bp is not None
               else jnp.zeros((cp,), f32))
    p["n3"], p["n5"] = n3, n5
    return p


# ----------------------------------------------------------------- pass 2 ---

def _apply_msfn_kernel(vp_ref, vc_ref, vn_ref, xp_ref, xc_ref, xn_ref,
                       atw_ref, bp_ref, ln2w_ref, ln2b_ref, wi_ref, bi_ref,
                       dw3_ref, b13_ref, dw5_ref, b15_ref,
                       *rest, th: int, width: int, c_real: int,
                       n3: int, gmeta: tuple, ln_bias: bool, eps: float,
                       h_total: int):
    # rest = [kg_i, sb_i, wo_i per stage-2 group ...], bo_ref, o_ref
    bo_ref, o_ref = rest[-2], rest[-1]
    grefs = [rest[i : i + 3] for i in range(0, len(rest) - 2, 3)]
    wp = xc_ref.shape[2]
    cp = xc_ref.shape[-1]
    cps = vc_ref.shape[-1]
    S = wi_ref.shape[-1]
    hi = pl.program_id(1)
    thh = th + 2 * HALO
    prec = jax.lax.Precision.DEFAULT

    vs = jnp.concatenate([vp_ref[0], vc_ref[0], vn_ref[0]], axis=0)
    xs = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)

    # attention apply + projection (A^T W_proj pre-folded) for th+8 rows —
    # the two 5x5 MSFN stages' halo rows are recomputed locally.
    v2 = vs.reshape(thh * wp, cps)
    ao = jnp.dot(v2, atw_ref[0], preferred_element_type=jnp.float32,
                 precision=prec) + bp_ref[:]
    ao = ao.reshape(thh, wp, cp) + xs.astype(jnp.float32)

    s1 = jnp.sum(ao, axis=-1, keepdims=True)
    s2 = jnp.sum(ao * ao, axis=-1, keepdims=True)
    mu = s1 / c_real
    var = s2 / c_real - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    if ln_bias:
        y = (ao - mu) * inv * ln2w_ref[:] + ln2b_ref[:]
    else:
        y = ao * inv * ln2w_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (thh, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (thh, wp), 1)
    grow = rows + hi * th - HALO
    valid = ((grow >= 0) & (grow < h_total) & (cols >= BORDER)
             & (cols < BORDER + width))
    mask = valid.astype(jnp.float32)[:, :, None]

    y2 = y.reshape(thh * wp, cp).astype(jnp.bfloat16)
    u = jnp.dot(y2, wi_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
    u = (u + bi_ref[:]).reshape(thh, wp, S) * mask
    if _BF16_STORE:
        # bf16 tap inputs, fp32 accumulation: ~5% more VPU time but half
        # the VMEM -> tile heights 2x larger -> less halo recompute
        u = u.astype(jnp.bfloat16)

    # stage 1 over d-frame canvas cols [2, width+6) (covers the stage-2 5x5
    # column halo; positions outside the image are zeroed by the masks) and
    # rows [hi*th-2, hi*th+th+2) (th+4 rows).
    wd = width + 4
    thd = th + 4

    def taps(src, k, dw_ref, row0, col0):
        # d[j, i] = sum_{t,s} src[j + row0 + t, i + col0 + s] * dw[t*k+s]
        shifted = [src[:, col0 + s : col0 + s + wd, :] for s in range(k)]
        acc = jnp.zeros((thd, wd, src.shape[-1]), jnp.float32)
        for t in range(k):
            for s in range(k):
                acc = acc + (shifted[s][row0 + t : row0 + t + thd]
                             * dw_ref[t * k + s])
        return acc

    # d row j <-> global row hi*th - 2 + j; d col i <-> canvas col i + 2.
    # 3x3 taps read u rows j+1+t / canvas cols i+2-1+s -> col0 = 1;
    # 5x5 taps read u rows j+t   / canvas cols i+2-2+s -> col0 = 0.
    u3 = u[:, :, :n3]
    u5 = u[:, :, n3:]
    d3 = taps(u3, 3, dw3_ref, 1, 1) + b13_ref[:]
    d5 = taps(u5, 5, dw5_ref, 0, 0) + b15_ref[:]

    drows = jax.lax.broadcasted_iota(jnp.int32, (thd, wd), 0)
    dcols = jax.lax.broadcasted_iota(jnp.int32, (thd, wd), 1)
    dgrow = drows + hi * th - 2
    dvalid = ((dgrow >= 0) & (dgrow < h_total) & (dcols >= 2)
              & (dcols < 2 + width))
    dmask = dvalid.astype(jnp.float32)[:, :, None]
    d3 = jnp.maximum(d3, 0.0) * dmask
    d5 = jnp.maximum(d5, 0.0) * dmask
    if _BF16_STORE:
        d3, d5 = d3.astype(jnp.bfloat16), d5.astype(jnp.bfloat16)

    # stage 2: out row j <-> global hi*th + j (always interior); out col mo
    # <-> canvas col mo+4 <-> d col mo+2. k=3 reads d rows j+1+t, cols
    # mo+1+s; k=5 reads d rows j+t, cols mo+s.
    out = jnp.zeros((th * width, cp), jnp.float32)
    for (region, off, ln, k), (kg_ref, sb_ref, wo_ref) in zip(gmeta, grefs):
        d = d3 if region == "3" else d5
        sl = d[:, :, off : off + 2 * ln]
        r0c0 = 1 if k == 3 else 0
        shifted = [sl[:, r0c0 + s : r0c0 + s + width, :] for s in range(k)]
        acc = jnp.zeros((th, width, 2 * ln), jnp.float32)
        for t in range(k):
            for s in range(k):
                acc = acc + (shifted[s][r0c0 + t : r0c0 + t + th]
                             * kg_ref[t * k + s])
        ssum = acc[:, :, :ln] + acc[:, :, ln:]
        ssum = jnp.maximum(ssum + sb_ref[:], 0.0)
        out = out + jnp.dot(ssum.reshape(th * width, ln).astype(jnp.bfloat16),
                            wo_ref[:], preferred_element_type=jnp.float32,
                            precision=prec)

    out = (out + bo_ref[:]).reshape(th, width, cp)
    out = out + ao[HALO : HALO + th, BORDER : BORDER + width, :]
    o_ref[0] = jnp.zeros((th, wp, cp), o_ref.dtype)
    o_ref[0, :, BORDER : BORDER + width, :] = out.astype(o_ref.dtype)


# ---------------------------------------------------------------- driver ---

def _forward(xc, params, cfg, interpret: bool = False):
    (c, w, num_heads, ln_type, eps) = cfg
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not interpret:
        x = canvas_unpad(xc, w, c, border=BORDER)
        out = _reference_drs_block(x, params, cfg)
        return canvas_pad(out, border=BORDER)

    (ln1w, ln1b, wq, bq, wdw, bdw, temp, mix, wo, bo,
     ln2w, ln2b, ki, bi, k3b, b3b, k5b, b5b, s3b, sb3, s5b, sb5,
     kp, bp) = params
    b, h, wp, cp = xc.shape
    # gran = lane granule: 128 on the real chip; 8 under interpret-mode CPU
    # tests so tiny shapes stay tiny (alignment is a non-issue there)
    gran = 128 if on_tpu else 8
    cps = _round_up(c, gran)
    cs = c if _round_up(3 * c, gran) < 3 * cps else cps
    offs = (0, cs, 2 * cs)
    op = _round_up(3 * cs, gran)
    # Always the relayout-free span q^T k: the per-slot extraction path's
    # jnp.pad-on-offset-vector does not lower under the border-4 canvas
    # (Mosaic "result/input offset mismatch on non-concat dimension"), and
    # extraction only pays at tiny grids where DRSformer's latent blocks are
    # cheap anyway.
    qk_lo = (cs // gran) * gran
    qk_hi = _round_up(2 * cs + c, gran)
    span = qk_hi - qk_lo
    qo, ko = cs - qk_lo, 2 * cs - qk_lo
    ss_w = span
    ch = c // num_heads
    ln_bias = ln_type != "BiasFree"
    hidden = ki.reshape(c, -1).shape[-1] // 2

    pk = pack_front((ln1w, ln1b, wq, bq, wdw, bdw, wo, bo),
                    c, cp, cps, offs, op)
    vmap, prod, sss = run_front(
        xc, pk, c=c, cps=cps, offs=offs, op=op, qk_lo=qk_lo, qk_hi=qk_hi,
        span=span, ss_w=ss_w, ln_bias=ln_bias, eps=eps, width=w,
        border=BORDER, interpret=interpret and not on_tpu)

    # ---- finalize: TKSA top-k mixture on the tiny gram ----
    qn = jnp.maximum(jnp.sqrt(sss[:, 0, qo : qo + c]), 1e-12)
    kn = jnp.maximum(jnp.sqrt(sss[:, 0, ko : ko + c]), 1e-12)
    logits = (prod[:, qo : qo + c, ko : ko + c]
              / (qn[:, :, None] * kn[:, None, :]))
    tv = temp.reshape(num_heads).astype(jnp.float32)
    afull = jnp.zeros((b, cps, cps), jnp.float32)
    for i in range(num_heads):
        blk = logits[:, i * ch : (i + 1) * ch, i * ch : (i + 1) * ch] * tv[i]
        asum = 0.0
        for mi, frac in enumerate((1 / 2, 2 / 3, 3 / 4, 4 / 5)):
            kk = int(ch * frac)
            thresh = jax.lax.top_k(blk, kk)[0][..., -1:]
            masked = jnp.where(blk >= thresh, blk, -jnp.inf)
            asum = asum + (jax.nn.softmax(masked, axis=-1)
                           * mix[mi].astype(jnp.float32))
        afull = jax.lax.dynamic_update_slice(afull, asum, (0, i * ch, i * ch))
    at = jnp.swapaxes(afull, 1, 2)
    atw = jnp.einsum("bij,jk->bik", at,
                     pk["wp"].astype(jnp.float32)).astype(xc.dtype)

    # ---- pass 2 ----
    pm = _pack_msfn((ln2w, ln2b, ki, bi, k3b, b3b, k5b, b5b,
                     s3b, sb3, s5b, sb5, kp, bp), c, cp, hidden, part=gran)
    n3, n5 = pm["n3"], pm["n5"]
    S = n3 + n5
    gmeta = tuple((gr["region"], gr["off"], gr["ln"], gr["k"])
                  for gr in pm["groups"])

    mx2ln = max(2 * gr["ln"] for gr in pm["groups"])
    ud = 2 if _BF16_STORE else 4

    def vmem2(t):
        thh = t + 2 * HALO
        return (thh * wp * (cps + cp) * 2      # vs/xs (bf16)
                + thh * wp * cp * 4            # ao
                + thh * wp * S * ud            # u
                + (t + 4) * (w + 4) * (n3 + n5) * ud  # d3/d5
                + t * w * mx2ln * 4            # stage-2 accumulator
                + t * wp * cp * 4 + cp * S * 2)

    cand = [t for t in range(4, min(h, 64) + 1, 4) if h % t == 0]
    if not cand:
        # no 4-aligned tile divides h: run the reference composition
        x = canvas_unpad(xc, w, c, border=BORDER)
        return canvas_pad(_reference_drs_block(x, params, cfg),
                          border=BORDER)
    # largest 4-aligned tile under the soft budget; the smallest one
    # otherwise (the 100 MB hard limit still guards — at th=4 the pass-2
    # footprint stays ~55 MB even at 512^2 c=96's 1024-slot layout, and a
    # silent reference fallback costs ~10x)
    under = [t for t in cand if vmem2(t) <= VMEM_SOFT]
    th2 = max(under) if under else cand[0]
    if _FORCE_TH and h % _FORCE_TH == 0 and _FORCE_TH % 4 == 0:
        th2 = _FORCE_TH

    kern2 = functools.partial(
        _apply_msfn_kernel, th=th2, width=w, c_real=c, n3=n3, gmeta=gmeta,
        ln_bias=ln_bias, eps=eps, h_total=h)
    gargs = []
    for gr in pm["groups"]:
        gargs += [gr["kg"], gr["sb"], gr["wo"]]
    out = pl.pallas_call(
        kern2,
        grid=(b, h // th2),
        in_specs=[row_spec(h, -HALO, th2, cps, wp, rows=4),
                  cur_spec(wp, th2, cps),
                  row_spec(h, th2, th2, cps, wp, rows=4),
                  row_spec(h, -HALO, th2, cp, wp, rows=4),
                  cur_spec(wp, th2, cp),
                  row_spec(h, th2, th2, cp, wp, rows=4),
                  pl.BlockSpec((1, cps, cp), lambda bi_, hi: (bi_, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [VSPEC] * (10 + 3 * len(pm["groups"])),
        out_specs=pl.BlockSpec((1, th2, wp, cp),
                               lambda bi_, hi: (bi_, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, cp), xc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret and not on_tpu,
    )(vmap, vmap, vmap, xc, xc, xc, atw, pk["bp"], pm["ln2w"], pm["ln2b"],
      pm["w_in"], pm["b_in"], pm["dw3"], pm["b1_3"], pm["dw5"], pm["b1_5"],
      *gargs, pm["bo"])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_drs_block(xc, params, cfg):
    """One whole DRSformer TransformerBlock on the border-4 canvas.

    xc: (B, H, WP, CP) canvas from ``canvas_pad(x, border=4)``; cfg =
    (c_real, w_real, num_heads, ln_type, eps) static. params = 24-tuple:
    (ln1_w, ln1_b, w_qkv, b_qkv, w_dw, b_dw, temperature, (mix1..mix4),
     w_proj, b_proj, ln2_w, ln2_b, w_in, b_in, w_dw3, b_dw3, w_dw5, b_dw5,
     w_s3, b_s3, w_s5, b_s5, w_out, b_out).
    Returns the next block's canvas."""
    return _forward(xc, params, cfg)


def _fwd(xc, params, cfg):
    return _forward(xc, params, cfg), (xc, params)


def _bwd(cfg, res, g):
    (c, w, _nh, _lt, _eps) = cfg
    xc, params = res

    def ref(xcc, pp):
        x = canvas_unpad(xcc, w, c, border=BORDER)
        return canvas_pad(_reference_drs_block(x, pp, cfg), border=BORDER)

    _, vjp = jax.vjp(ref, xc, params)
    return vjp(g)


fused_drs_block.defvjp(_fwd, _bwd)
