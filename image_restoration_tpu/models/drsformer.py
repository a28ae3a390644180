"""DRSformer, TPU-native (reference DRSformer_arch.py — CVPR'23 sparse derain
transformer).

Top-K Sparse Attention: the CxC channel-attention rows keep only their top-k
logits at four sparsity levels (C/2, 2C/3, 3C/4, 4C/5); the four softmaxed
outputs are combined with learnable scalars (DRSformer_arch.py:101-173).
Mixed-Scale FFN with parallel 3x3/5x5 depthwise pipelines (:62-99). MEFC
"mixture of experts feature compensator": a NAS-style bank of 8 conv/pool
ops mixed by a GAP-predicted softmax per step (:189-353), used at level 0
and refinement.

TPU notes: torch's scatter-of-topk-indices mask is replaced by a
threshold-against-kth-value mask (identical for distinct logits, static
shapes, no scatter); the op bank concat+1x1 is one einsum-fused conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import normalized_channel_logits
from image_restoration_tpu.ops.common import Conv, ConvParams, GroupedConv
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class TKSA(nn.Module):
    """Top-K sparse channel attention (DRSformer_arch.py:101-173)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        temperature = self.param("temperature", nn.initializers.ones,
                                 (heads, 1, 1), self.param_dtype)
        mix = [self.param(f"attn{i+1}", nn.initializers.constant(0.2), (1,),
                          self.param_dtype) for i in range(4)]
        qkv = Conv(c * 3, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(c * 3, 3, padding=1, groups=c * 3, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, h * w, heads, ch)

        # L2 normalization over the HW axis commutes with the q.k^T
        # contraction: contract RAW q/k (one pass over the big (HW, C)
        # tensors, fp32 accumulation) and rescale the tiny (C, C) product by
        # the outer product of the channel norms — no fp32 materialization
        # of q/k and no separate normalize passes. torch F.normalize's
        # max(||.||, eps) clamp is applied to the norms identically.
        qh, kh, vt = split_heads(q), split_heads(k), split_heads(v)
        logits = normalized_channel_logits(qh, kh)
        logits = logits * temperature.reshape(1, heads, 1, 1).astype(jnp.float32)

        # sum_i mix_i * (attn_i @ v) == (sum_i mix_i * attn_i) @ v: fold the
        # learnable mix into the tiny (heads, C, C) matrices and apply V
        # ONCE — 4x fewer passes over the (HW, C) value tensor, exact math
        # (fp32 accumulation of the mix happens before the einsum instead of
        # after, which only tightens it).
        attn_sum = 0.0
        for i, frac in enumerate((1 / 2, 2 / 3, 3 / 4, 4 / 5)):
            kk = int(ch * frac)
            thresh = jax.lax.top_k(logits, kk)[0][..., -1:]
            masked = jnp.where(logits >= thresh, logits, -jnp.inf)
            attn = jax.nn.softmax(masked, axis=-1)
            attn_sum = attn_sum + attn * mix[i].astype(jnp.float32)
        out = jnp.einsum("bhcd,bnhd->bnhc", attn_sum.astype(x.dtype), vt,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        return Conv(c, 1, use_bias=self.use_bias, name="project_out", **kw)(out)


def _msfn_layout(hidden: int, part: int = 128):
    """Interleave-free layout for MSFN's two stages (DRSformer_arch.py:62-99).

    The reference computes d3 = relu(dw3(u)), d5 = relu(dw5(u)) over the
    2H-channel u, then for each path p (x1/x2) a grouped conv with 2
    in-channels per group over concat[p] = [d3-half | d5-half]: group g reads
    concat channels (2g, 2g+1). Expressed directly, that takes strided
    channel interleaves of 134 MB tensors — cross-lane relayouts on TPU.

    Instead, every permutation moves into the WEIGHTS: project_in's output
    columns are gathered so u lands pre-permuted in "slot" order where each
    group's two operands sit at the SAME offset of two adjacent 128-aligned
    streams (A, B), grouped into four regions per path:
      [A3 B3] k3-sourced slots (stage-1 3x3 bank, gathered) and
      [A5 B5] k5-sourced slots (stage-1 5x5 bank).
    The one mixed group an odd H produces (operands d3[H-1] and d5[0]) rides
    the k5 region with its 3x3 kernel zero-padded to 5x5 — exact, and it
    keeps every pair co-located so relu(sum) stays correct. The group output
    is then t[A]+t[B] slotwise, and project_out's rows are gathered to match
    (pad slots get zero rows). Same contraction as the reference, fully
    128-aligned, zero activation relayouts.

    Returns (numpy arrays) dict with per-slot source/bank/row indices.
    """
    import numpy as np

    H = hidden

    def pad_to(n):
        return -(-n) // 1 * 0 + ((n + part - 1) // part) * part

    per_path = []
    for path in range(2):
        base = H * path
        pure3, pure5, mixed = [], [], []
        for g in range(H):
            i0, i1 = 2 * g, 2 * g + 1
            k0, k1 = i0 < H, i1 < H  # True = d3-sourced
            if k0 and k1:
                pure3.append(g)
            elif not k0 and not k1:
                pure5.append(g)
            else:
                mixed.append(g)  # i0 = H-1 (d3), i1 = H (d5)
        assert len(mixed) <= 1
        L3 = pad_to(len(pure3))
        L5 = pad_to(len(pure5) + len(mixed))

        def entry(i, tap, g, promote):
            # concat index i -> (u src channel, stage-1 bank, bank channel)
            if i < H:
                return dict(src=base + i, bank=3 if not promote else 5,
                            bch=base + i, promote=promote, tap=tap, g=g)
            return dict(src=base + i - H, bank=5, bch=base + i - H,
                        promote=False, tap=tap, g=g)

        pad = dict(src=0, bank=0, bch=0, promote=False, tap=0, g=-1)
        A3 = [entry(2 * g, 0, g, False) for g in pure3] + [pad] * (L3 - len(pure3))
        B3 = [entry(2 * g + 1, 1, g, False) for g in pure3] + [pad] * (L3 - len(pure3))
        A5 = ([entry(2 * g, 0, g, False) for g in pure5]
              + [entry(2 * g, 0, g, True) for g in mixed])
        B5 = ([entry(2 * g + 1, 1, g, False) for g in pure5]
              + [entry(2 * g + 1, 1, g, False) for g in mixed])
        A5 += [pad] * (L5 - len(A5))
        B5 += [pad] * (L5 - len(B5))
        per_path.append(dict(A3=A3, B3=B3, A5=A5, B5=B5, L3=L3, L5=L5))

    # global slot order: [p0A3 p0B3 p1A3 p1B3 | p0A5 p0B5 p1A5 p1B5]
    k3_slots = (per_path[0]["A3"] + per_path[0]["B3"]
                + per_path[1]["A3"] + per_path[1]["B3"])
    k5_slots = (per_path[0]["A5"] + per_path[0]["B5"]
                + per_path[1]["A5"] + per_path[1]["B5"])
    slots = k3_slots + k5_slots

    def arr(key):
        return np.array([s[key] for s in slots], np.int32)

    return dict(
        src=arr("src"), bank=arr("bank"), bch=arr("bch"),
        promote=np.array([s["promote"] for s in slots], bool),
        tap=arr("tap"), g=arr("g"),
        valid=np.array([s["g"] >= 0 for s in slots], bool),
        n_k3=len(k3_slots),
        L3=(per_path[0]["L3"], per_path[1]["L3"]),
        L5=(per_path[0]["L5"], per_path[1]["L5"]),
    )


class MSFN(nn.Module):
    """Mixed-scale FFN (:62-99), interleave-free formulation (_msfn_layout)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        from image_restoration_tpu.ops.common import _dwconv_taps

        hidden = int(self.dim * self.expansion)
        H = hidden
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dt = x.dtype if self.dtype is None else self.dtype

        ki, bi = ConvParams(hidden * 2, self.dim, 1, self.use_bias,
                            param_dtype=self.param_dtype, name="project_in")()
        k3b, b3b = ConvParams(hidden * 2, 1, 3, self.use_bias,
                              param_dtype=self.param_dtype, name="dwconv3x3")()
        k5b, b5b = ConvParams(hidden * 2, 1, 5, self.use_bias,
                              param_dtype=self.param_dtype, name="dwconv5x5")()
        s3b, sb3 = ConvParams(hidden, 2, 3, self.use_bias,
                              param_dtype=self.param_dtype, name="dwconv3x3_1")()
        s5b, sb5 = ConvParams(hidden, 2, 5, self.use_bias,
                              param_dtype=self.param_dtype, name="dwconv5x5_1")()
        kp, bp = ConvParams(self.dim, hidden * 2, 1, self.use_bias,
                            param_dtype=self.param_dtype, name="project_out")()

        # 128-aligned parts on TPU (lane tile); tiny parts elsewhere so the
        # CPU test suite doesn't pay 12x pad-slot tap work at dim=8
        lay = _msfn_layout(hidden,
                           part=128 if jax.default_backend() == "tpu" else 8)
        n3 = lay["n_k3"]
        valid = jnp.asarray(lay["valid"])
        src = jnp.asarray(lay["src"])

        # project_in with gathered/zeroed columns -> u in slot order
        w_in = jnp.where(valid[None, :], ki[0, 0][:, src], 0.0)
        u = jnp.einsum("bhwc,cs->bhws", x.astype(dt), w_in.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        if bi is not None:
            u = u + jnp.where(valid, bi[src], 0.0).astype(dt)

        # stage 1: per-slot dw banks. k3 region uses the 3x3 bank; k5 region
        # the 5x5 bank, with promoted (mixed-group d3) slots carrying their
        # 3x3 kernel zero-padded to 5x5.
        bch = lay["bch"]
        k3g = k3b[:, :, :, bch[:n3]] * jnp.asarray(lay["valid"][:n3],
                                                   k3b.dtype)
        k5g = k5b[:, :, :, bch[n3:]]
        pad33 = jnp.pad(k3b, ((1, 1), (1, 1), (0, 0), (0, 0)))
        promote5 = jnp.asarray(lay["promote"][n3:])
        k5g = jnp.where(promote5[None, None, None, :],
                        pad33[:, :, :, bch[n3:]], k5g)
        k5g = k5g * jnp.asarray(lay["valid"][n3:], k5g.dtype)
        d3 = _dwconv_taps(u[..., :n3], k3g.astype(dt), 1)
        d5 = _dwconv_taps(u[..., n3:], k5g.astype(dt), 2)
        if b3b is not None:
            d3 = d3 + jnp.where(valid[:n3], b3b[bch[:n3]], 0.0).astype(dt)
            d5 = d5 + jnp.where(valid[n3:],
                                jnp.where(promote5, b3b[bch[n3:]],
                                          b5b[bch[n3:]]), 0.0).astype(dt)
        d3, d5 = nn.relu(d3), nn.relu(d5)

        # stage 2: per-path taps (path0 3x3 bank, path1 5x5) + A/B pair sums.
        # glo indexes the GLOBAL slot arrays; the region tensors (d3/d5) are
        # sliced at glo minus their region start.
        tap, g = lay["tap"], lay["g"]
        L3p0, L3p1 = lay["L3"]
        L5p0, L5p1 = lay["L5"]
        wp = kp[0, 0]  # (2H, dim); rows gathered per sum block below —
        # duplicated-row linearity absorbs the odd-H mixed group's split

        def s2block(tensor, start, glo, ln, bank, sbias, k, half):
            sl = jax.lax.slice_in_dim(tensor, glo - start,
                                      glo - start + 2 * ln, axis=-1)
            reg_tap = tap[glo : glo + 2 * ln]
            reg_g = np.maximum(g[glo : glo + 2 * ln], 0)
            kg = bank[:, :, reg_tap, reg_g]          # (k, k, 2ln)
            kg = kg * jnp.asarray(g[glo : glo + 2 * ln] >= 0, kg.dtype)
            t = _dwconv_taps(sl, kg[:, :, None, :].astype(dt), k // 2)
            s = t[..., :ln] + t[..., ln:]
            g_a = g[glo : glo + ln]                   # A-stream group ids
            if sbias is not None:
                s = s + jnp.where(g_a >= 0, sbias[np.maximum(g_a, 0)],
                                  0.0).astype(dt)
            s = nn.relu(s)
            rows = jnp.where((g_a >= 0)[:, None],
                             wp[np.maximum(g_a, 0) + half * H], 0.0)
            return jnp.einsum("bhws,sd->bhwd", s, rows.astype(s.dtype),
                              preferred_element_type=jnp.float32)

        out = (s2block(d3, 0, 0, L3p0, s3b, sb3, 3, 0)
               + s2block(d3, 0, 2 * L3p0, L3p1, s5b, sb5, 5, 1)
               + s2block(d5, n3, n3, L5p0, s3b, sb3, 3, 0)
               + s2block(d5, n3, n3 + 2 * L5p0, L5p1, s5b, sb5, 5, 1))
        if bp is not None:
            out = out + bp
        return out.astype(x.dtype)


class _TKSAParams(nn.Module):
    """Param twin of TKSA (temperature / attn1..4 / qkv / qkv_dwconv /
    project_out) for the fused whole-block path."""

    dim: int
    num_heads: int
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        d = self.dim
        temp = self.param("temperature", nn.initializers.ones,
                          (self.num_heads, 1, 1), self.param_dtype)
        mix = tuple(self.param(f"attn{i+1}", nn.initializers.constant(0.2),
                               (1,), self.param_dtype) for i in range(4))
        wq, bq = ConvParams(3 * d, d, 1, self.use_bias, self.param_dtype,
                            name="qkv")()
        wd, bd = ConvParams(3 * d, 1, 3, self.use_bias, self.param_dtype,
                            name="qkv_dwconv")()
        wo, bo = ConvParams(d, d, 1, self.use_bias, self.param_dtype,
                            name="project_out")()
        return temp, mix, wq, bq, wd, bd, wo, bo


class _MSFNParams(nn.Module):
    """Param twin of MSFN (project_in / dw banks / stage-2 banks /
    project_out)."""

    dim: int
    expansion: float
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        hidden = int(self.dim * self.expansion)
        pd = self.param_dtype
        ki, bi = ConvParams(hidden * 2, self.dim, 1, self.use_bias, pd,
                            name="project_in")()
        k3b, b3b = ConvParams(hidden * 2, 1, 3, self.use_bias, pd,
                              name="dwconv3x3")()
        k5b, b5b = ConvParams(hidden * 2, 1, 5, self.use_bias, pd,
                              name="dwconv5x5")()
        s3b, sb3 = ConvParams(hidden, 2, 3, self.use_bias, pd,
                              name="dwconv3x3_1")()
        s5b, sb5 = ConvParams(hidden, 2, 5, self.use_bias, pd,
                              name="dwconv5x5_1")()
        kp, bp = ConvParams(self.dim, hidden * 2, 1, self.use_bias, pd,
                            name="project_out")()
        return ki, bi, k3b, b3b, k5b, b5b, s3b, sb3, s5b, sb5, kp, bp


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fused_block: bool = False  # whole-block 2-pass canvas kernel (serving)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_real: int | None = None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_block:
            # x is a border-4 canvas from drs_block_pallas.canvas_pad;
            # w_real is the pre-padding image width (static).
            from image_restoration_tpu.kernels.drs_block_pallas import (
                fused_drs_block,
            )
            from image_restoration_tpu.models.restormer import _LNParams

            d = self.dim
            lnw1, lnb1 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm1")(d)
            temp, mix, wq, bq, wd, bd, wo, bo = _TKSAParams(
                d, self.num_heads, self.use_bias, self.param_dtype,
                name="attn")()
            lnw2, lnb2 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norm2")(d)
            mp = _MSFNParams(d, self.expansion, self.use_bias,
                             self.param_dtype, name="ffn")()
            params = (lnw1, lnb1, wq, bq, wd, bd, temp, mix, wo, bo,
                      lnw2, lnb2) + mp
            return fused_drs_block(
                x, params, (d, w_real, self.num_heads, self.ln_type, 1e-5))
        x = x + TKSA(self.dim, self.num_heads, self.use_bias, name="attn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm1")(x))
        x = x + MSFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norm2")(x))
        return x


class _DRSScanCell(nn.Module):
    """Scan body: one DRSformer TransformerBlock compiled ONCE per level
    (stacked params on axis 0) — mirrors restormer._ScanCell."""

    dim: int
    num_heads: int
    expansion: float
    use_bias: bool
    ln_type: str
    fused_block: bool
    w_real: int | None
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, _):
        blk = TransformerBlock(
            dim=self.dim, num_heads=self.num_heads, expansion=self.expansion,
            use_bias=self.use_bias, ln_type=self.ln_type,
            fused_block=self.fused_block, dtype=self.dtype,
            param_dtype=self.param_dtype, name="block")
        return blk(x, w_real=self.w_real), None


# --- MEFC op bank (:189-353) -------------------------------------------------

def _avg_pool3x3_exclude_pad(x):
    """AvgPool2d(3, stride 1, pad 1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[1:3] + (1,), x.dtype)[None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(jnp.broadcast_to(ones, ones.shape), 0.0, jax.lax.add,
                                (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


class SepConvOp(nn.Module):
    c: int
    k: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        p = self.k // 2
        x = Conv(self.c, self.k, padding=p, groups=self.c, use_bias=False,
                 name="op_0", **kw)(x)
        x = Conv(self.c, 1, use_bias=False, name="op_1", **kw)(x)
        x = nn.relu(x)
        x = Conv(self.c, self.k, padding=p, groups=self.c, use_bias=False,
                 name="op_3", **kw)(x)
        return Conv(self.c, 1, use_bias=False, name="op_4", **kw)(x)


class DilConvOp(nn.Module):
    c: int
    k: int
    dil: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.k - 1) * self.dil // 2
        x = GroupedConv(self.c, (self.k, self.k), padding=[(pad, pad)] * 2,
                    kernel_dilation=(self.dil, self.dil), feature_group_count=self.c,
                    use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="op_0")(x)
        return Conv(self.c, 1, use_bias=False, name="op_1", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)


class OperationLayer(nn.Module):
    """8-op bank mixed by per-sample weights, concat -> 1x1 -> ReLU (:189-204)."""

    c: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, weights):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        outs = [
            SepConvOp(self.c, 1, name="_ops_0", **kw)(x),
            SepConvOp(self.c, 3, name="_ops_1", **kw)(x),
            SepConvOp(self.c, 5, name="_ops_2", **kw)(x),
            SepConvOp(self.c, 7, name="_ops_3", **kw)(x),
            DilConvOp(self.c, 3, name="_ops_4", **kw)(x),
            DilConvOp(self.c, 5, name="_ops_5", **kw)(x),
            DilConvOp(self.c, 7, name="_ops_6", **kw)(x),
            _avg_pool3x3_exclude_pad(x),
        ]
        # Keep the 8c concat + ONE 1x1: a sum of 8 separate c->c dots was
        # A/B'd (r4) and lost — XLA materializes the 8 op outputs either way,
        # and 8 small dots beat neither the single wide MXU matmul nor the
        # one extra concat buffer.
        states = [o * weights[:, i].reshape(-1, 1, 1, 1).astype(o.dtype)
                  for i, o in enumerate(outs)]
        cat = jnp.concatenate(states, axis=-1)
        return nn.relu(Conv(self.c, 1, use_bias=False, name="_out_0", **kw)(cat))


class _GConvLeaf(nn.Module):
    """Param twin of GroupedConv (kernel at module level, no 'conv' nest)."""

    features: int
    m: int
    kernel_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (k, k, self.m, self.features), self.param_dtype)


class _SepParams(nn.Module):
    """Param twin of SepConvOp (op_0 dw / op_1 1x1 / op_3 dw / op_4 1x1)."""

    c: int
    k: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        c, k, pd = self.c, self.k, self.param_dtype
        dwa, _ = ConvParams(c, 1, k, False, pd, name="op_0")()
        w1, _ = ConvParams(c, c, 1, False, pd, name="op_1")()
        dwb, _ = ConvParams(c, 1, k, False, pd, name="op_3")()
        w2, _ = ConvParams(c, c, 1, False, pd, name="op_4")()
        return dict(dwa=dwa, w1=w1, dwb=dwb, w2=w2)


class _DilParams(nn.Module):
    """Param twin of DilConvOp (op_0 grouped dw / op_1 1x1)."""

    c: int
    k: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        dw = _GConvLeaf(self.c, 1, self.k, self.param_dtype, name="op_0")()
        w1, _ = ConvParams(self.c, self.c, 1, False, self.param_dtype,
                           name="op_1")()
        return dict(dw=dw, w1=w1)


class _StepParams(nn.Module):
    """Param twin of OperationLayer (the 8-op bank + concat 1x1)."""

    c: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        sep = [_SepParams(self.c, k, self.param_dtype, name=f"_ops_{i}")()
               for i, k in enumerate((1, 3, 5, 7))]
        dil = [_DilParams(self.c, k, self.param_dtype,
                          name=f"_ops_{4 + i}")()
               for i, k in enumerate((3, 5, 7))]
        wcat, _ = ConvParams(self.c, 8 * self.c, 1, False, self.param_dtype,
                             name="_out_0")()
        return dict(sep=sep, dil=dil, wcat=wcat)


class Subnet(nn.Module):
    """MEFC: OALayer weights + GroupOLs residual op-mixture steps (:206-353).

    ``fused`` runs each op-mixture step as one Pallas canvas pass
    (kernels/mefc_pallas) — identical param tree, reference composition on
    non-TPU backends and in the backward pass."""

    dim: int
    layer_num: int = 1
    steps: int = 4
    fused: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # module names rely on the importer's skip-unmatched-segment walk;
        # layer_num > 1 would alias names (the reference only uses 1)
        assert self.layer_num == 1, "Subnet names assume layer_num == 1"
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        num_ops = 8
        # OALayer: GAP -> 2-layer MLP -> (steps, num_ops) softmax
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.steps * num_ops * 2, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ca_fc_0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.steps * num_ops, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ca_fc_2")(y)
        weights = jax.nn.softmax(
            y.reshape(-1, self.steps, num_ops).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        # GroupOLs: preprocess conv+ReLU, then residual op-mixture steps
        s0 = nn.relu(Conv(self.dim, 1, use_bias=False, name="preprocess", **kw)(x))
        if self.fused:
            from image_restoration_tpu.kernels.mefc_pallas import (
                fused_mefc_steps,
            )

            raw = [_StepParams(self.dim, self.param_dtype,
                               name=f"_ops_{st}")()
                   for st in range(self.steps)]
            return fused_mefc_steps(s0, raw, weights)
        for st in range(self.steps):
            res = s0
            s0 = OperationLayer(self.dim, name=f"_ops_{st}", **kw)(s0, weights[:, st, :])
            s0 = nn.relu(s0 + res)
        return s0


@register_model("drsformer")
class DRSformer(nn.Module):
    """DRSformer_arch.py:388-478: Restormer-shaped U-Net with TKSA/MSFN blocks
    and MEFC at level 0 + refinement."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fused_block: bool = False  # whole-block 2-pass canvas kernel (serving)
    scan_blocks: bool = False  # nn.scan over each level's blocks
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _run_level(self, x, dim, heads, n, prefix):
        """One resolution's block stack; with fused_block the level runs on
        a single persistent border-4 canvas (mirrors restormer
        BlockStackMixin._run_level)."""
        w = x.shape[2]
        if self.fused_block:
            from image_restoration_tpu.kernels.drs_block_pallas import (
                BORDER,
                canvas_pad,
                canvas_unpad,
            )

            c = x.shape[-1]
            x = canvas_pad(x, border=BORDER)
        bkw = dict(dim=dim, num_heads=heads,
                   expansion=self.ffn_expansion_factor,
                   use_bias=self.use_bias, ln_type=self.ln_type,
                   fused_block=self.fused_block, dtype=self.dtype,
                   param_dtype=self.param_dtype)
        if self.scan_blocks:
            cell = nn.scan(
                _DRSScanCell,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=n,
            )(w_real=w if self.fused_block else None,
              name=f"{prefix}_scan", **bkw)
            x, _ = cell(x, None)
        else:
            for i in range(n):
                blk = TransformerBlock(name=f"{prefix}_{i}", **bkw)
                x = blk(x, w_real=w) if self.fused_block else blk(x)
        if self.fused_block:
            x = canvas_unpad(x, w, c, border=BORDER)
        return x

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = inp_img.astype(self.dtype) if self.dtype is not None else inp_img
        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)
        feats = Subnet(d, fused=self.fused_block, name="encoder_level0", **kw)(feats)
        enc1 = self._run_level(feats, d, self.heads[0], self.num_blocks[0],
                               "encoder_level1")
        enc2 = Downsample(d, name="down1_2", **kw)(enc1)
        enc2 = self._run_level(enc2, d * 2, self.heads[1], self.num_blocks[1],
                               "encoder_level2")
        enc3 = Downsample(d * 2, name="down2_3", **kw)(enc2)
        enc3 = self._run_level(enc3, d * 4, self.heads[2], self.num_blocks[2],
                               "encoder_level3")
        latent = Downsample(d * 4, name="down3_4", **kw)(enc3)
        latent = self._run_level(latent, d * 8, self.heads[3],
                                 self.num_blocks[3], "latent")
        dec3 = Upsample(d * 8, name="up4_3", **kw)(latent)
        dec3 = Conv(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3",
                    **kw)(jnp.concatenate([dec3, enc3], -1))
        dec3 = self._run_level(dec3, d * 4, self.heads[2], self.num_blocks[2],
                               "decoder_level3")
        dec2 = Upsample(d * 4, name="up3_2", **kw)(dec3)
        dec2 = Conv(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2",
                    **kw)(jnp.concatenate([dec2, enc2], -1))
        dec2 = self._run_level(dec2, d * 2, self.heads[1], self.num_blocks[1],
                               "decoder_level2")
        dec1 = Upsample(d * 2, name="up2_1", **kw)(dec2)
        dec1 = jnp.concatenate([dec1, enc1], -1)
        dec1 = self._run_level(dec1, d * 2, self.heads[0], self.num_blocks[0],
                               "decoder_level1")
        dec1 = Subnet(d * 2, fused=self.fused_block, name="refinement", **kw)(dec1)
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(dec1) + x
        return out.astype(jnp.float32)


def drsformer_key_map(key: str):
    """Normalize MEFC keys: 'encoder_level0.layers.1._ops.0._ops.3.op.4.w'
    -> segments [encoder_level0, layers_1(skipped), _ops_0, _ops_3, op_4, w];
    ca_fc Sequential indices joined so they land on our Dense names."""
    return key.replace("._ops.", "._ops_").replace(".ca_fc.", ".ca_fc_")
