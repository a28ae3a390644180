"""LumiSenseMoE, TPU-native (reference LumiSenseMoE/src/net/LimiSenseMoE.py).

MoCE-IR decoder (freq-gated complexity experts, Attention shared branch,
CrossAttention mixer) under a Retinexformer-style illumination-guided
encoder: estimator (depthwise groups = n_fea_middle here, unlike IGMoCE's
groups=4) -> x*illu_map + x; encoder blocks are IG_MSA (V scaled by the raw
illumination feature) with the reference's normed-shortcut quirk
(EncoderBlock.forward: x = norm(x); x = x + mixer(x) — the residual base is
the normed tensor). The illumination stream shares the feats' down/upsample
modules. This is also the behavioral superset of the repo's modified
MoCE-IR-main/src/net/moce_ir.py (whose DecoderBlock cannot run as written).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.adair import ChannelCrossAttention
from image_restoration_tpu.models.moce_ir import (
    AdapterLayer,
    FrequencyEmbedding,
)
from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.attention import MDTA, normalized_channel_logits
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.ffn import GDFN
from image_restoration_tpu.ops.illumination import IlluminationEstimator
from image_restoration_tpu.ops.layernorm import LayerNorm
from image_restoration_tpu.ops.resample import Downsample, Upsample


class IGMSASimple(nn.Module):
    """LimiSenseMoE.py:233-280: MDTA whose V is scaled by illu_fea directly."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, illu_fea):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (heads, 1, 1), self.param_dtype)
        qkv = Conv(c * 3, 1, use_bias=self.use_bias, name="qkv", **kw)(x)
        qkv = Conv(c * 3, 3, padding=1, groups=c * 3, use_bias=self.use_bias,
                   name="qkv_dwconv", **kw)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        v = v * illu_fea

        def split_heads(t):
            return t.reshape(b, h * w, heads, ch)

        attn = normalized_channel_logits(split_heads(q), split_heads(k))
        attn = jax.nn.softmax(
            attn * temperature.reshape(1, heads, 1, 1).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        out = jnp.einsum("bhcd,bnhd->bnhc", attn, split_heads(v),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return Conv(c, 1, use_bias=self.use_bias, name="project_out",
                    **kw)(out.reshape(b, h, w, c))


class LumiEncoderBlock(nn.Module):
    """normed-shortcut pre-norm block (LimiSenseMoE.py:283-300)."""

    dim: int
    num_heads: int
    expansion: float = 2.0
    use_bias: bool = True
    ln_type: str = "WithBias"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, illu_fea):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_0")(x)
        x = x + IGMSASimple(self.dim, self.num_heads, self.use_bias,
                            name="mixer", **kw)(x, illu_fea)
        x = LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_1")(x)
        return x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(x)


class LumiDecoderBlock(nn.Module):
    """Same as the original MoCE DecoderBlock (LimiSenseMoE.py:747-797)."""

    dim: int
    num_heads: int
    expansion: float = 2.0
    use_bias: bool = False
    ln_type: str = "WithBias"
    rank: int = 2
    num_experts: int = 4
    top_k: int = 1
    stage_depth: int = 1
    depth_type: Any = "lin"
    rank_type: str = "constant"
    freq_dim: int = 128
    with_complexity: bool = False
    complexity_scale: str = "max"
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
            self.complexity_scale, name="adapter", **kw)(x_a, freq_emb, x_s, train=train)
        x = ChannelCrossAttention(self.dim, self.num_heads, self.use_bias,
                                  kv_kernel=7, name="mixer", **kw)(x_a, x_s) + shortcut
        x = x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn", **kw)(
            LayerNorm(self.ln_type, param_dtype=self.param_dtype, name="norms_1")(x))
        return x, aux


@register_model("lumisense_moe")
class LumiSenseMoEIR(nn.Module):
    """LimiSenseMoE.py:833-1003."""

    # class-level flag (not a dataclass field): the trainer derives the
    # train=True apply set from this instead of a hardcoded name list
    uses_moe_rng = True

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 32
    levels: int = 4
    heads: Sequence[int] = (1, 1, 1, 1)
    num_blocks: Sequence[int] = (1, 1, 1, 3)
    num_dec_blocks: Sequence[int] = (1, 1, 1)
    ffn_expansion_factor: float = 2.0
    num_refinement_blocks: int = 1
    ln_type: str = "WithBias"
    use_bias: bool = False
    rank: int = 2
    num_experts: int = 4
    depth_type: Any = "lin"
    stage_depth: Sequence[int] = (3, 2, 1)
    rank_type: str = "constant"
    topk: int = 1
    with_complexity: bool = False
    complexity_scale: str = "max"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        dims = [d * 2**i for i in range(self.levels)]
        H, W = img.shape[1:3]
        pad = 2 ** self.levels
        ph, pw = (-H) % pad, (-W) % pad
        img_p = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = img_p.astype(self.dtype) if self.dtype is not None else img_p

        illu_fea, illu_map = IlluminationEstimator(
            d, depth_groups=d, name="estimator", **kw)(x)
        x = x * illu_map + x
        feats = Conv(d, 3, padding=1, use_bias=False, name="embedding", **kw)(x)

        enc_feats = []
        downs = [Downsample(dims[i], name=f"enc_{i}_1", **kw)
                 for i in range(self.levels - 1)]
        for i in range(self.levels - 1):
            for b in range(self.num_blocks[i]):
                feats = LumiEncoderBlock(
                    dims[i], self.heads[i], self.ffn_expansion_factor, True,
                    self.ln_type, name=f"enc_{i}_0_{b}", **kw)(feats, illu_fea)
            enc_feats.append(feats)
            feats = downs[i](feats)
            illu_fea = downs[i](illu_fea)  # shared module (reference reuses it)

        for b in range(self.num_blocks[-1]):
            feats = LumiEncoderBlock(
                dims[-1], self.heads[-1], self.ffn_expansion_factor, True,
                self.ln_type, name=f"latent_{b}", **kw)(feats, illu_fea)
        freq_emb = FrequencyEmbedding(dims[-1], name="freq_embed", **kw)(feats)

        rdims = dims[::-1]
        rheads = list(self.heads)[::-1]
        rdec = list(self.num_dec_blocks)[::-1]
        total_aux = 0.0
        for i in range(self.levels - 1):
            up = Upsample(rdims[i], name=f"dec_{i}_0", **kw)
            feats = up(feats)
            illu_fea = up(illu_fea)  # shared module (reference reuses it)
            feats = jnp.concatenate([feats, enc_feats.pop()], axis=-1)
            feats = Conv(rdims[i + 1], 1, use_bias=self.use_bias,
                         name=f"dec_{i}_1", **kw)(feats)
            for b in range(rdec[i]):
                feats, aux = LumiDecoderBlock(
                    rdims[i + 1], rheads[i + 1], self.ffn_expansion_factor,
                    self.use_bias, self.ln_type, rank=self.rank,
                    num_experts=self.num_experts, top_k=self.topk,
                    stage_depth=self.stage_depth[i], depth_type=self.depth_type,
                    rank_type=self.rank_type, freq_dim=rdims[0],
                    with_complexity=self.with_complexity,
                    complexity_scale=self.complexity_scale,
                    name=f"dec_{i}_2_{b}", **kw)(feats, freq_emb, train=train)
                total_aux = total_aux + aux

        # reference reverses `heads` twice before refinement -> heads[0]
        for b in range(self.num_refinement_blocks):
            feats = LumiEncoderBlock(
                d, self.heads[0], self.ffn_expansion_factor, True,
                self.ln_type, name=f"refinement_{b}", **kw)(feats, illu_fea)
        out = Conv(self.out_channels, 3, padding=1, use_bias=self.use_bias,
                   name="output", **kw)(feats)
        # residual to the PADDED input image (reference reassigns img before
        # the estimator, LimiSenseMoE.py forward)
        out = (out + img_p.astype(out.dtype)).astype(jnp.float32)[:, :H, :W, :]
        aux_total = total_aux / sum(self.num_dec_blocks)
        if train:
            return out, {"aux_loss": aux_total}
        return out


def lumisense_key_map(key: str):
    if key.endswith("routing.complexity"):
        return None
    return key.replace(".layers.", ".")
