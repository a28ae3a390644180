"""MoCE-IR, TPU-native (reference moce_ir_orignal.py — the pristine CVPR'25
model; the repo's modified copy MoCE-IR-main/src/net/moce_ir.py:768,787
references a commented-out mixer and cannot run, so the original is the
parity source of truth, per SURVEY.md §7).

Restormer-style encoder + mixture-of-complexity-experts decoder:
* bottleneck FrequencyEmbedding: frozen 3x3 high-pass dwconv -> GAP -> MLP
  (moce_ir_orignal.py:743-764)
* DecoderBlock: LN -> split shared/adapter 1x1 -> shared MDTA branch;
  AdapterLayer MoE of ModExperts (low-rank proj, FFTAttention body with
  per-expert patch sizes 4/8/16/32 and kv-dwconv kernels 3/5/7/9, SiLU-gated
  by the shared branch); CrossAttention mixer re-injects the shared branch
  (:593-642)
* noisy top-k routing with image gate + frequency gate, importance/load aux
  losses (:671-747 in the modified copy, identical here)

TPU redesign: dense gate-weighted combine replaces SparseDispatcher (see
ops/moe.py); the eval path is the same dense program (the reference's eval
branch assumes batch=1). ModExpert.feat_extract's depth loop re-applies
``process`` to the ORIGINAL input (moce_ir_orignal.py ModExpert.feat_extract
— `feat = process(feats)` never feeds back), so depth>1 equals depth==1; we
compute one application and keep `depth` only for the complexity statistic.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.adair import ChannelCrossAttention
from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import MDTA
from image_restoration_tpu.ops.common import Conv, GroupedConv, gelu_exact
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.moe import (
    dense_moe_combine,
    importance_loss,
    load_loss,
    noisy_topk_gates,
)
from image_restoration_tpu.ops.resample import Downsample, Upsample


class FFTAttention(nn.Module):
    """Patchified Fourier attention (moce_ir_orignal.py:309-360).

    q (1x1 + 3x3 dw) and k (1x1 + 7x7-or-kernel_size dw) are patchified to
    (patch x patch) tiles, multiplied in rfft space, inverse-transformed,
    LayerNormed, gated by v, projected out. FFT in fp32.
    """

    dim: int
    kernel_size: int = 7
    patch_size: int = 8
    use_matmul_dft: bool | None = None  # None = auto (on for TPU): tiny
    # batched patch FFTs lower poorly on TPU; as MXU einsums the same
    # transform is several x faster (see ops/fft.rfft2_matmul)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax as _jax

        from image_restoration_tpu.ops.fft import irfft2_matmul, rfft2_matmul

        b, h, w, c = x.shape
        p = self.patch_size
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = Conv(c, 1, use_bias=False, name="q", **kw)(x)
        q = Conv(c, 3, padding=1, groups=c, use_bias=True, name="q_dwconv", **kw)(q)
        kv = Conv(c * 2, 1, use_bias=False, name="kv", **kw)(x)
        kv = Conv(c * 2, self.kernel_size, padding=self.kernel_size // 2,
                  groups=c * 2, use_bias=True, name="kv_dwconv", **kw)(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        ph, pw = (-h) % p, (-w) % p
        hp, wp = h + ph, w + pw

        def patchify(t):
            t = jnp.pad(t, ((0, 0), (0, ph), (0, pw), (0, 0)))
            t = t.reshape(b, hp // p, p, wp // p, p, c)
            return t.transpose(0, 1, 3, 2, 4, 5)  # (b, nh, nw, p, p, c)

        matmul = self.use_matmul_dft
        if matmul is None:
            matmul = _jax.default_backend() == "tpu"
        if matmul:
            n_patches = (hp // p) * (wp // p)
            qp = patchify(q).reshape(b * n_patches, p, p, c)
            kp = patchify(k).reshape(b * n_patches, p, p, c)
            # rfft2 'backward' norm == ortho-fwd x sqrt(p*p); the q*k product
            # then differs by p*p, and irfft-'backward' divides it out again:
            # ortho-ortho-ortho reproduces backward-backward-backward exactly
            # up to the sqrt(p*p) factor applied once below.
            # at bf16 serving the whole patch-DFT runs bf16 with fp32 MXU
            # accumulation (FourierUnit's documented trade: half the HBM
            # traffic, one matmul pass instead of HIGH's three); dtype=None
            # (parity/eval) keeps the fp32 transform
            cdt = jnp.bfloat16 if self.dtype == jnp.bfloat16 else None
            qr, qi = rfft2_matmul(qp, compute_dtype=cdt)
            kr, ki = rfft2_matmul(kp, compute_dtype=cdt)
            pr = qr * kr - qi * ki
            pi = qr * ki + qi * kr
            outp = irfft2_matmul(pr, pi, p, compute_dtype=cdt) * float(p)
            out = outp.reshape(b, hp // p, wp // p, p, p, c)
        else:
            qf = jnp.fft.rfft2(patchify(q).astype(jnp.float32), axes=(3, 4))
            kf = jnp.fft.rfft2(patchify(k).astype(jnp.float32), axes=(3, 4))
            out = jnp.fft.irfft2(qf * kf, s=(p, p), axes=(3, 4))
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :h, :w, :]
        out = out.astype(x.dtype)
        out = LayerNorm("WithBias", param_dtype=self.param_dtype, name="norm")(out)
        out = out * v
        return Conv(c, 1, use_bias=True, name="proj_out", **kw)(out)


def fft_attention_param_count(dim: int, kernel_size: int) -> int:
    """Static param count of FFTAttention(dim, kernel_size) for the routing
    complexity bias (reference counts torch params at init)."""
    return (
        dim * dim            # q
        + dim * 9 + dim      # q_dwconv + bias
        + dim * 2 * dim      # kv
        + 2 * dim * kernel_size**2 + 2 * dim  # kv_dwconv + bias
        + 2 * dim            # norm weight+bias
        + dim * dim + dim    # proj_out + bias
    )


class ModExpert(nn.Module):
    """Low-rank complexity expert (moce_ir_orignal.py ModExpert)."""

    dim: int
    rank: int
    patch_size: int
    kernel_size: int
    depth: int = 1  # reference loop never feeds back; kept for complexity stat
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shared):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        h = Conv(self.rank, 1, use_bias=False, name="proj_0", **kw)(x)
        # NB: the reference passes kernel_size into FFTAttention but the
        # module hardcodes a 7x7 kv dwconv (moce_ir_orignal.py:309-321);
        # only patch_size actually varies per expert.
        h = FFTAttention(self.rank, kernel_size=7,
                         patch_size=self.patch_size, name="body", **kw)(h)
        gate = jax.nn.silu(Conv(self.rank, 1, use_bias=False, name="proj_1", **kw)(shared))
        h = h * gate
        h = Conv(self.dim, 1, use_bias=False, name="proj_2", **kw)(h)
        return h + shortcut


def expert_param_count(dim: int, rank: int, kernel_size: int = 7) -> int:
    # kernel_size fixed at 7 — see ModExpert note; with rank_type=constant
    # every expert has identical params, so the complexity bias is flat 1.0
    # (matching the reference's param-count statistic exactly).
    return dim * rank * 2 + rank * dim + fft_attention_param_count(rank, 7)


class RoutingFunction(nn.Module):
    """Noisy top-k gate: image GAP gate + frequency-embedding gate
    (modified moce_ir.py:671-747; identical in the original)."""

    dim: int
    freq_dim: int
    num_experts: int
    k: int
    complexity: Sequence[float]  # normalized expert param counts
    use_complexity_bias: bool = False
    tau: float = 1.0
    use_freq_gate: bool = True  # IGMoCE routes on the image gate alone
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="gate_2")(pooled.astype(jnp.float32))
        if self.use_freq_gate:
            logits = logits + nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name="freq_gate")(
                freq_emb.astype(jnp.float32))
        noise_std = 1.0 / self.num_experts
        rng = self.make_rng("moe") if train else None
        gates, top_idx, top_vals, noisy = noisy_topk_gates(logits, self.k, noise_std, rng)
        aux = 0.0
        if train:
            comp = jnp.asarray(self.complexity, jnp.float32) if self.use_complexity_bias else None
            li = importance_loss(jax.nn.softmax(logits, axis=-1), comp, self.tau)
            ll = load_loss(logits, noisy, noise_std, self.k)
            aux = 0.5 * li + 0.5 * ll
        return gates, top_idx, top_vals, aux


def _expert_schedules(num_experts, stage_depth, rank, dim, depth_type, rank_type):
    import math

    patch_sizes = [2 ** (i + 2) for i in range(num_experts)]
    kernel_sizes = [3 + 2 * i for i in range(num_experts)]
    depths = {
        "lin": [stage_depth + i for i in range(num_experts)],
        "double": [stage_depth + 2 * i for i in range(num_experts)],
        "exp": [2**i for i in range(num_experts)],
        "fact": [math.factorial(i + 1) for i in range(num_experts)],
        "constant": [stage_depth] * num_experts,
    }[depth_type if isinstance(depth_type, str) else "constant"] \
        if not isinstance(depth_type, int) else [depth_type] * num_experts
    ranks = {
        "constant": [rank] * num_experts,
        "lin": [rank + i for i in range(num_experts)],
        "double": [rank + 2 * i for i in range(num_experts)],
        "exp": [rank ** (i + 1) for i in range(num_experts)],
        "fact": [math.factorial(rank + i) for i in range(num_experts)],
        "spread": [dim // (2**i) for i in range(num_experts)][::-1],
    }[rank_type]
    return patch_sizes, kernel_sizes, depths, ranks


class AdapterLayer(nn.Module):
    """MoE of ModExperts with dense dispatch (moce_ir_orignal.py AdapterLayer)."""

    dim: int
    rank: int
    num_experts: int = 4
    top_k: int = 2
    stage_depth: int = 1
    depth_type: Any = "lin"
    rank_type: str = "constant"
    freq_dim: int = 128
    with_complexity: bool = False
    complexity_scale: str = "max"
    switched_eval: bool = True
    # top-1 batch-1 eval runs only the SELECTED expert via nn.switch
    # (identical math: unselected gates are exactly 0 in the dense combine)
    # — E x less expert compute on the serving path (the big MoCE-IR config
    # routes top-1, options.py:69-84). Training stays dense (gradients +
    # aux losses need every expert's zero-gate path); top-k>1 stays dense
    # (k switch calls over shared submodules would need one fused branch
    # set per selection).
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, shared, train: bool = False):
        patches, kernels, depths, ranks = _expert_schedules(
            self.num_experts, self.stage_depth, self.rank, self.dim,
            self.depth_type, self.rank_type)
        counts = [expert_param_count(self.dim, r) for r in ranks]
        denom = min(counts) if self.complexity_scale == "min" else max(counts)
        complexity = tuple(c / denom for c in counts)

        gates, top_idx, top_vals, aux = RoutingFunction(
            self.dim, self.freq_dim, self.num_experts, self.top_k, complexity,
            self.with_complexity, dtype=self.dtype, param_dtype=self.param_dtype,
            name="routing")(x, freq_emb, train=train)

        experts = [
            ModExpert(self.dim, rank=r, patch_size=p, kernel_size=k, depth=d,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"experts_{i}_0")
            for i, (r, p, k, d) in enumerate(zip(ranks, patches, kernels, depths))
        ]
        # NB: never switch while initializing — flax's lifted switch creates
        # branch params as tracers that leak into the returned variables
        # (init must run every expert eagerly on the dense path instead).
        use_switch = (self.switched_eval and not train and x.shape[0] == 1
                      and self.top_k == 1 and self.num_experts > 1
                      and not self.is_initializing())
        if use_switch:
            branches = [
                (lambda e: lambda mdl, x_, s_: e(x_, s_))(e) for e in experts
            ]
            o = nn.switch(top_idx[0, 0], branches, self, x, shared)
            out = top_vals[0, 0].astype(o.dtype) * o
        else:
            outs = [e(x, shared) for e in experts]
            out = dense_moe_combine(gates, outs)
        out = Conv(self.dim, 1, use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="proj_out")(out)
        return out, aux


class EncoderBlock(nn.Module):
    """LN -> MDTA -> +res; LN -> GDFN -> +res (moce_ir_orignal.py:573-588).

    Structurally identical to Restormer's TransformerBlock (different param
    names: norms_0/mixer/norms_1/ffn), so the same whole-block Pallas canvas
    kernel applies — ``fused_block=True`` + a canvas input runs the entire
    block in two HBM passes (kernels/block_pallas.py)."""

    dim: int
    num_heads: int
    expansion: float = 2.0
    use_bias: bool = True
    ln_type: str = "WithBias"
    fused_block: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w_real: int | None = None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_block:
            from image_restoration_tpu.kernels.block_pallas import fused_block
            from image_restoration_tpu.models.restormer import (
                _AttnParams, _GDFNParams, _LNParams,
            )

            d = self.dim
            lnw1, lnb1 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norms_0")(d)
            temp, wq, bq, wd, bd, wo, bo = _AttnParams(
                d, self.num_heads, self.use_bias, self.param_dtype,
                name="mixer")()
            lnw2, lnb2 = _LNParams(self.ln_type, self.param_dtype,
                                   name="norms_1")(d)
            w_in, b_in, w_dw2, b_dw2, w_out, b_out = _GDFNParams(
                d, self.expansion, self.use_bias, self.param_dtype,
                name="ffn")()
            params = (lnw1, lnb1, wq, bq, wd, bd, temp, wo, bo, lnw2, lnb2,
                      w_in, b_in, w_dw2, b_dw2, w_out, b_out)
            return fused_block(
                x, params, (d, w_real, self.num_heads, self.ln_type, 1e-5),
                None)
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, name="mixer", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_0")(x))
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_1")(x))
        return x


class DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.0
    use_bias: bool = False
    ln_type: str = "WithBias"
    rank: int = 2
    num_experts: int = 4
    top_k: int = 2
    stage_depth: int = 1
    depth_type: Any = "lin"
    rank_type: str = "constant"
    freq_dim: int = 128
    with_complexity: bool = False
    complexity_scale: str = "max"
    switched_eval: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        xn = LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_0")(x)
        x_s = Conv(self.dim, 1, use_bias=True, name="proj_0", **kw)(xn)
        x_a = Conv(self.dim, 1, use_bias=True, name="proj_1", **kw)(xn)
        x_s = MDTA(self.dim, self.num_heads, self.use_bias, name="shared", **kw)(x_s)
        x_a, aux = AdapterLayer(
            self.dim, self.rank, self.num_experts, self.top_k, self.stage_depth,
            self.depth_type, self.rank_type, self.freq_dim, self.with_complexity,
            self.complexity_scale, switched_eval=self.switched_eval,
            name="adapter", **kw)(x_a, freq_emb, x_s, train=train)
        x = ChannelCrossAttention(self.dim, self.num_heads, self.use_bias,
                                  kv_kernel=7, name="mixer", **kw)(x_a, x_s) + shortcut
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_1")(x))
        return x, aux


class _EncScanCell(nn.Module):
    """nn.scan body over a level's identical EncoderBlocks (stacked params,
    block body compiled once per level — the Restormer scan_blocks trick)."""

    dim: int
    num_heads: int
    expansion: float
    ln_type: str
    fused_block: bool
    w_real: int | None
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, _):
        blk = EncoderBlock(self.dim, self.num_heads, self.expansion, True,
                           self.ln_type, fused_block=self.fused_block,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="block")
        out = blk(x, w_real=self.w_real) if self.fused_block else blk(x)
        return out, None


class _DecScanCell(nn.Module):
    """nn.scan body over a level's DecoderBlocks; freq_emb rides the carry
    (constant), the MoE aux loss accumulates in it."""

    dim: int
    num_heads: int
    expansion: float
    use_bias: bool
    ln_type: str
    rank: int
    num_experts: int
    top_k: int
    stage_depth: int
    depth_type: Any
    rank_type: str
    freq_dim: int
    with_complexity: bool
    complexity_scale: str
    switched_eval: bool
    train: bool
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, carry, _):
        x, aux_total, freq_emb = carry
        blk = DecoderBlock(
            self.dim, self.num_heads, self.expansion, self.use_bias,
            self.ln_type, rank=self.rank, num_experts=self.num_experts,
            top_k=self.top_k, stage_depth=self.stage_depth,
            depth_type=self.depth_type, rank_type=self.rank_type,
            freq_dim=self.freq_dim, with_complexity=self.with_complexity,
            complexity_scale=self.complexity_scale,
            switched_eval=self.switched_eval, dtype=self.dtype,
            param_dtype=self.param_dtype, name="block")
        x, aux = blk(x, freq_emb, train=self.train)
        return (x, aux_total + aux, freq_emb), None


class FrequencyEmbedding(nn.Module):
    """Frozen high-pass dwconv -> GELU -> GAP -> MLP (:743-764)."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]

        def hp_init(key, shape, dtype=jnp.float32):
            hp = jnp.asarray([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype)
            return jnp.tile(hp.reshape(3, 3, 1, 1), (1, 1, 1, shape[-1]))

        # the reference intends this frozen (HighPassConv2d(freeze=True)) but
        # `requires_grad_ = False` is an attribute assignment, not a call, so
        # published checkpoints may carry trained weights — keep it a param.
        h = GroupedConv(c, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=c,
                        use_bias=False, kernel_init=hp_init, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="high_conv_0")(x)
        h = gelu_exact(h)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dense(2 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="mlp_0")(h)
        h = gelu_exact(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="mlp_2")(h)


@register_model("moce_ir")
class MoCEIR(nn.Module):
    """moce_ir_orignal.py:769-887 (+ check_image_size pad from the modified
    copy, needed for arbitrary eval sizes)."""

    # class-level flag (not a dataclass field): the trainer derives the
    # train=True apply set from this instead of a hardcoded name list
    uses_moe_rng = True

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 32
    levels: int = 3
    heads: Sequence[int] = (2, 4, 8)
    num_blocks: Sequence[int] = (1, 2, 3)
    num_dec_blocks: Sequence[int] = (2, 4)
    ffn_expansion_factor: float = 2.0
    num_refinement_blocks: int = 1
    ln_type: str = "WithBias"
    use_bias: bool = False
    rank: int = 2
    num_experts: int = 4
    depth_type: Any = "lin"
    stage_depth: Sequence[int] = (3, 2, 1)
    rank_type: str = "constant"
    topk: int = 2
    with_complexity: bool = False
    complexity_scale: str = "max"
    switched_eval: bool = True  # top-1 batch-1 eval via nn.switch (see AdapterLayer)
    fused_block: bool = False  # whole-block Pallas canvas kernel for the
    # MDTA+GDFN encoder/latent/refinement stacks (kernels/block_pallas.py)
    scan_blocks: bool = False  # nn.scan per homogeneous stack (fast compile)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _run_enc(self, x, dim, heads, n, prefix):
        """One encoder/latent/refinement stack at a fixed resolution, with
        the same canvas/scan fast paths as Restormer._run_level."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        w = x.shape[2]
        if self.fused_block:
            from image_restoration_tpu.kernels.block_pallas import (
                canvas_pad, canvas_unpad,
            )

            c = x.shape[-1]
            x = canvas_pad(x)
        if self.scan_blocks:
            cell = nn.scan(
                _EncScanCell, variable_axes={"params": 0},
                split_rngs={"params": True}, length=n,
            )(dim, heads, self.ffn_expansion_factor, self.ln_type,
              self.fused_block, w if self.fused_block else None,
              self.dtype, self.param_dtype, name=f"{prefix}scan")
            x, _ = cell(x, None)
        else:
            for b in range(n):
                blk = EncoderBlock(dim, heads, self.ffn_expansion_factor,
                                   True, self.ln_type,
                                   fused_block=self.fused_block,
                                   name=f"{prefix}{b}", **kw)
                x = blk(x, w_real=w) if self.fused_block else blk(x)
        if self.fused_block:
            x = canvas_unpad(x, w, c)
        return x

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        H, W = img.shape[1:3]
        pad = 2 ** (self.levels - 1)
        ph, pw = (-H) % pad, (-W) % pad
        x = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = x.astype(self.dtype) if self.dtype is not None else x

        d = self.dim
        dims = [d * 2**i for i in range(self.levels)]
        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)

        enc_feats = []
        for i in range(self.levels - 1):
            feats = self._run_enc(feats, dims[i], self.heads[i],
                                  self.num_blocks[i], f"enc_{i}_0_")
            enc_feats.append(feats)
            feats = Downsample(dims[i], name=f"enc_{i}_1", **kw)(feats)

        feats = self._run_enc(feats, dims[-1], self.heads[-1],
                              self.num_blocks[-1], "latent_")
        freq_emb = FrequencyEmbedding(dims[-1], name="freq_embed", **kw)(feats)

        rdims = dims[::-1]
        rheads = list(self.heads)[::-1]
        rdec = list(self.num_dec_blocks)[::-1]
        total_aux = 0.0
        for i in range(self.levels - 1):
            feats = Upsample(rdims[i], name=f"dec_{i}_0", **kw)(feats)
            feats = jnp.concatenate([feats, enc_feats.pop()], axis=-1)
            feats = Conv(rdims[i + 1], 1, use_bias=self.use_bias,
                         name=f"dec_{i}_1", **kw)(feats)
            dec_cfg = dict(
                rank=self.rank, num_experts=self.num_experts, top_k=self.topk,
                stage_depth=self.stage_depth[i], depth_type=self.depth_type,
                rank_type=self.rank_type, freq_dim=rdims[0],
                with_complexity=self.with_complexity,
                complexity_scale=self.complexity_scale,
                switched_eval=self.switched_eval)
            if self.scan_blocks:
                cell = nn.scan(
                    _DecScanCell, variable_axes={"params": 0},
                    split_rngs={"params": True, "moe": True}, length=rdec[i],
                )(rdims[i + 1], rheads[i + 1], self.ffn_expansion_factor,
                  self.use_bias, self.ln_type, train=train,
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  name=f"dec_{i}_2_scan", **dec_cfg)
                (feats, aux, _), _ = cell(
                    (feats, jnp.zeros((), jnp.float32), freq_emb), None)
                total_aux = total_aux + aux
            else:
                for b in range(rdec[i]):
                    feats, aux = DecoderBlock(
                        rdims[i + 1], rheads[i + 1], self.ffn_expansion_factor,
                        self.use_bias, self.ln_type,
                        name=f"dec_{i}_2_{b}", **dec_cfg, **kw)(
                            feats, freq_emb, train=train)
                    total_aux = total_aux + aux

        feats = self._run_enc(feats, d, self.heads[0],
                              self.num_refinement_blocks, "refinement_")
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(feats)
        out = (out + x).astype(jnp.float32)[:, :H, :W, :]
        aux_total = total_aux / sum(self.num_dec_blocks)
        if train:
            return out, {"aux_loss": aux_total}
        return out


def moce_to_scan_params(params, levels=3, num_blocks=(1, 2, 3),
                        num_dec_blocks=(2, 4), num_refinement_blocks=1):
    """Convert a loop-layout MoCEIR param tree (enc_0_0_0, dec_0_2_1, ...) to
    the scan layout (enc_0_0_scan.block stacked on axis 0). Use after torch
    checkpoint import to run ``scan_blocks=True`` (the Restormer
    to_scan_params analog)."""
    import jax

    out = dict(params)
    groups = [(f"enc_{i}_0_", num_blocks[i]) for i in range(levels - 1)]
    groups += [("latent_", num_blocks[-1]),
               ("refinement_", num_refinement_blocks)]
    rdec = list(num_dec_blocks)[::-1]
    groups += [(f"dec_{i}_2_", rdec[i]) for i in range(levels - 1)]
    for prefix, n in groups:
        stack = [out.pop(f"{prefix}{b}") for b in range(n)]
        out[f"{prefix}scan"] = {
            "block": jax.tree.map(lambda *ls: jnp.stack(ls, 0), *stack)}
    return out


def moce_key_map(key: str):
    """Flatten the ResidualGroup 'layers' nesting so torch
    'enc.0.0.layers.1.<...>' lands on our 'enc_0_0_1' module names; drop the
    routing 'complexity' buffer (a static param-count statistic we recompute
    analytically)."""
    if key.endswith("routing.complexity"):
        return None
    return key.replace(".layers.", ".")
