"""Patch-level MoCE-IR, TPU-native — the reference's ``moce_ir_patch.py``
formulation where routing decisions are made per spatial PATCH, not per
image.

Reference behavior (moce_ir_patch.py):
* ``patch_split``/``patch_merge`` (:22-33) tile the feature map into
  ``patch_size``^2 tokens.
* ``PatchRoutingFunction`` (:524-609): per-patch gate = a ``num_experts``-
  channel conv with kernel=stride=patch_size (a strided patch pooling)
  plus the broadcast frequency gate; noisy softmax top-k per patch.
* ``PatchedSparseDispatcher`` (:74-128) scatters patches to experts — its
  data-dependent shapes cannot compile on TPU (and the reference copy is
  broken scratch code: ``combine`` calls ``gates.size[0]`` and the eval
  branch indexes a ModuleList with a tensor, :496-519). The build realizes
  the INTENDED math densely: every expert runs on every patch token
  (a batched, static-shape einsum over B*P patches — this is the
  TPU-friendly MoE formulation SURVEY.md §7 step 6 prefers) and the gate
  matrix zeroes unselected experts, which is numerically identical.
* The reference's load loss collapses a (B, P, k) index tensor with
  ``[:, -1]`` (:585), silently using only the last patch's thresholds; the
  build computes the standard per-token load loss over the flattened
  (B*P, E) logits instead (the formulation the per-image MoCE uses).

Model assembly is the MoCE-IR U-Net with the patch adapter in every decoder
block (moce_ir_patch.py:636-687, :820-953).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.adair import ChannelCrossAttention
from image_restoration_tpu.models.moce_ir import (
    EncoderBlock,
    FrequencyEmbedding,
    ModExpert,
    _expert_schedules,
    expert_param_count,
)
from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import MDTA
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.moe import (
    importance_loss,
    load_loss,
    noisy_topk_gates,
)
from image_restoration_tpu.ops.resample import Downsample, Upsample


def patch_split(x, p: int):
    """(B, H, W, C) -> (B*P, p, p, C) row-major patches (moce_ir_patch.py:22)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, p, p, c)


def patch_merge(x, b: int, h: int, w: int, p: int):
    c = x.shape[-1]
    x = x.reshape(b, h // p, w // p, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class PatchRoutingFunction(nn.Module):
    """moce_ir_patch.py:524-609 — per-patch noisy top-k gate."""

    dim: int
    freq_dim: int
    num_experts: int
    k: int
    complexity: Sequence[float]
    patch_size: int = 16
    use_complexity_bias: bool = False
    tau: float = 1.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, train: bool = False):
        b = x.shape[0]
        spatial = Conv(self.num_experts, self.patch_size,
                       stride=self.patch_size, use_bias=True, dtype=jnp.float32,
                       param_dtype=self.param_dtype, name="gate_0")(
            x.astype(jnp.float32))
        bb, hp, wp, e = spatial.shape
        spatial = spatial.reshape(b, hp * wp, e)
        freq = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="freq_gate")(
            freq_emb.astype(jnp.float32))
        logits = (spatial + freq[:, None, :]).reshape(b * hp * wp, e)

        noise_std = 1.0 / self.num_experts
        rng = self.make_rng("moe") if train else None
        gates, top_idx, top_vals, noisy = noisy_topk_gates(
            logits, self.k, noise_std, rng)
        aux = 0.0
        if train:
            comp = (jnp.asarray(self.complexity, jnp.float32)
                    if self.use_complexity_bias else None)
            li = importance_loss(jax.nn.softmax(logits, axis=-1), comp, self.tau)
            ll = load_loss(logits, noisy, noise_std, self.k)
            aux = 0.5 * li + 0.5 * ll
        return gates, top_idx, top_vals, aux  # gates: (B*P, E)


class PatchAdapterLayer(nn.Module):
    """moce_ir_patch.py:392-521, dense dispatch over patch tokens."""

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
    patch_size: int = 16
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, shared, train: bool = False):
        b, h, w, c = x.shape
        p = self.patch_size
        patches, kernels, depths, ranks = _expert_schedules(
            self.num_experts, self.stage_depth, self.rank, self.dim,
            self.depth_type, self.rank_type)
        counts = [expert_param_count(self.dim, r) for r in ranks]
        denom = min(counts) if self.complexity_scale == "min" else max(counts)
        complexity = tuple(cc / denom for cc in counts)

        gates, _, _, aux = PatchRoutingFunction(
            self.dim, self.freq_dim, self.num_experts, self.top_k, complexity,
            p, self.with_complexity, dtype=self.dtype,
            param_dtype=self.param_dtype, name="routing")(
            x, freq_emb, train=train)

        xt = patch_split(x, p)        # (B*P, p, p, C)
        st = patch_split(shared, p)
        out = jnp.zeros_like(xt)
        for i, (r, ps, ks, d) in enumerate(zip(ranks, patches, kernels, depths)):
            eo = ModExpert(self.dim, rank=r, patch_size=ps, kernel_size=ks,
                           depth=d, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"experts_{i}_0")(xt, st)
            out = out + eo * gates[:, None, None, i : i + 1].astype(eo.dtype)
        out = patch_merge(out, b, h, w, p)
        out = Conv(self.dim, 1, use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="proj_out")(out)
        return out, aux


class PatchDecoderBlock(nn.Module):
    """moce_ir_patch.py:636-687."""

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
    patch_size: int = 16
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
        x_a, aux = PatchAdapterLayer(
            self.dim, self.rank, self.num_experts, self.top_k, self.stage_depth,
            self.depth_type, self.rank_type, self.freq_dim, self.with_complexity,
            self.complexity_scale, self.patch_size, name="adapter",
            **kw)(x_a, freq_emb, x_s, train=train)
        x = ChannelCrossAttention(self.dim, self.num_heads, self.use_bias,
                                  kv_kernel=7, name="mixer", **kw)(x_a, x_s) + shortcut
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_1")(x))
        return x, aux


@register_model("moce_ir_patch")
class MoCEIRPatch(nn.Module):
    """moce_ir_patch.py:820-953 MoCEIR with per-patch expert routing."""

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
    patch_size: int = 16
    with_complexity: bool = False
    complexity_scale: str = "max"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        H, W = img.shape[1:3]
        # pad so every decoder level is divisible by its routing patch size
        pad = max(2 ** (self.levels - 1),
                  self.patch_size * 2 ** (self.levels - 2))
        ph, pw = (-H) % pad, (-W) % pad
        x = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = x.astype(self.dtype) if self.dtype is not None else x

        d = self.dim
        dims = [d * 2**i for i in range(self.levels)]
        feats = Conv(d, 3, padding=1, use_bias=False, name="patch_embed", **kw)(x)

        enc_feats = []
        for i in range(self.levels - 1):
            for b in range(self.num_blocks[i]):
                feats = EncoderBlock(dims[i], self.heads[i], self.ffn_expansion_factor,
                                     True, self.ln_type, name=f"enc_{i}_0_{b}",
                                     **kw)(feats)
            enc_feats.append(feats)
            feats = Downsample(dims[i], name=f"enc_{i}_1", **kw)(feats)

        for b in range(self.num_blocks[-1]):
            feats = EncoderBlock(dims[-1], self.heads[-1], self.ffn_expansion_factor,
                                 True, self.ln_type, name=f"latent_{b}", **kw)(feats)
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
            for b in range(rdec[i]):
                feats, aux = PatchDecoderBlock(
                    rdims[i + 1], rheads[i + 1], self.ffn_expansion_factor,
                    self.use_bias, self.ln_type, rank=self.rank,
                    num_experts=self.num_experts, top_k=self.topk,
                    stage_depth=self.stage_depth[i], depth_type=self.depth_type,
                    rank_type=self.rank_type, freq_dim=rdims[0],
                    with_complexity=self.with_complexity,
                    complexity_scale=self.complexity_scale,
                    patch_size=self.patch_size,
                    name=f"dec_{i}_2_{b}", **kw)(feats, freq_emb, train=train)
                total_aux = total_aux + aux

        for b in range(self.num_refinement_blocks):
            feats = EncoderBlock(d, self.heads[0], self.ffn_expansion_factor,
                                 True, self.ln_type,
                                 name=f"refinement_{b}", **kw)(feats)
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(feats)
        out = (out + x).astype(jnp.float32)[:, :H, :W, :]
        aux_total = total_aux / sum(self.num_dec_blocks)
        if train:
            return out, {"aux_loss": aux_total}
        return out
