"""HierViG — hierarchical gated-linear-attention backbone (vig_h.py),
TPU-native (NHWC, flax).

Re-designed from the reference ``vig_h.py``:

* ``GLA2D`` (:338-606): dwconv(+SiLU) local branch, fused qkv, low-rank
  forward/backward gates, bidirectional GLA scan (ops/gla.py), per-head
  RMSNorm gating of scan vs local. NB the reference halves the
  bidirectional sum only on the TRAIN path (:532) — its eval kernel output
  (:578) is double-counted; this build keeps the halved (train) math for
  both, which is the consistent formulation.
* ``VSSBlock`` (:610-683): pre/post-norm GLA + (g)MLP residual block.
* ``PatchMerging2D`` (:220-258) and strided-conv downsample variants, v1/v2
  patch embeds, LN classifier head (:686-923).

Layout note: the reference's ``channel_first`` switch is a torch layout
choice with identical math; the TPU build is NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.models.vig import RMSNorm, rope_2dv1
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.gla import bidirectional_gla


class GLA2D(nn.Module):
    """vig_h.py:338-606 (channels-last path)."""

    d_model: int
    num_heads: int = 4
    expand_k: float = 0.5
    expand_v: float = 1.0
    gate_low_rank_dim: int = 16
    gate_logit_normalizer: int = 16
    norm_eps: float = 1e-6
    rope_mode: str = "none"
    use_act_in_conv: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        l = h * w
        key_dim = int(self.d_model * self.expand_k)
        value_dim = int(self.d_model * self.expand_v)
        heads = self.num_heads
        hk = key_dim // heads
        hv = value_dim // heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        conv = Conv(c, 3, padding=1, groups=c, use_bias=False,
                    name="in_proj_0", **kw)(x)
        if self.use_act_in_conv:
            conv = jax.nn.silu(conv)
        xs = conv.reshape(b, l, c)

        qkv = nn.Dense(2 * key_dim + value_dim, use_bias=False,
                       name="qkv_proj", **kw)(xs)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        gk = nn.Dense(self.gate_low_rank_dim, use_bias=False,
                      name="gk_proj_0", **kw)(xs)
        gk = nn.Dense(2 * key_dim, use_bias=True, name="gk_proj_1", **kw)(gk)
        fw_gk, bw_gk = jnp.split(gk, 2, axis=-1)

        def hm(t, hd):
            return t.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)

        if self.rope_mode == "2dv1":
            q1 = q.reshape(b, l, heads, hk)
            k1 = k.reshape(b, l, heads, hk)
            qh = rope_2dv1(q1, h, w, hk).transpose(0, 2, 1, 3)
            kh = rope_2dv1(k1, h, w, hk).transpose(0, 2, 1, 3)
        else:
            qh, kh = hm(q, hk), hm(k, hk)
        vh = hm(v, hv)
        logsig = lambda t: jax.nn.log_sigmoid(t.astype(jnp.float32))
        gf = logsig(hm(fw_gk, hk)) / self.gate_logit_normalizer
        gb = logsig(hm(bw_gk, hk)) / self.gate_logit_normalizer

        o = bidirectional_gla(qh, kh, vh, gf, gb).transpose(0, 2, 1, 3)

        g = jax.nn.sigmoid(nn.Dense(value_dim, use_bias=True,
                                    name="g_proj", **kw)(xs))
        g = g.reshape(b, l, heads, hv)
        o = RMSNorm(self.norm_eps, self.param_dtype, name="g_norm")(o)
        local_h = RMSNorm(self.norm_eps, self.param_dtype, name="l_norm")(
            xs.reshape(b, l, heads, c // heads))
        o = o * g + local_h * (1 - g)
        o = o.reshape(b, l, value_dim)
        o = nn.Dense(self.d_model, use_bias=False, name="o_proj", **kw)(o)
        return o.reshape(b, h, w, self.d_model)


class VSSBlock(nn.Module):
    """vig_h.py:610-683 (pre-norm variant; gmlp selects the SwiGLU MLP)."""

    dim: int
    num_heads: int
    expand_k: float = 0.5
    expand_v: float = 1.0
    rope_mode: str = "none"
    mlp_ratio: float = 4.0
    gmlp: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="norm")(x)
        x = x + GLA2D(self.dim, self.num_heads, self.expand_k, self.expand_v,
                      rope_mode=self.rope_mode, name="op", **kw)(h)
        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="norm2")(x)
        if self.gmlp:
            inter = int(self.dim * 4 * 2 / 3)
            inter = 32 * ((inter + 31) // 32)
            y = nn.Dense(inter * 2, use_bias=False, name="mlp_fc1", **kw)(h)
            gate, y = jnp.split(y, 2, axis=-1)
            m = nn.Dense(self.dim, use_bias=False, name="mlp_fc2", **kw)(
                jax.nn.silu(gate) * y)
        else:
            m = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1", **kw)(h)
            m = jax.nn.gelu(m, approximate=False)
            m = nn.Dense(self.dim, name="mlp_fc2", **kw)(m)
        return x + m


class PatchMerging2D(nn.Module):
    """vig_h.py:220-258 (channels-last)."""

    dim: int
    out_dim: int = -1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="norm")(x)
        out = self.out_dim if self.out_dim > 0 else 2 * self.dim
        return nn.Dense(out, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="reduction")(x)


@register_model("vig_h")
class HierViG(nn.Module):
    """vig_h.py:686-923."""

    patch_size: int = 4
    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    expand_k: float = 0.5
    expand_v: float = 1.0
    rope_mode: str = "none"
    mlp_ratio: float = 4.0
    gmlp: bool = False
    downsample_version: str = "v2"  # 'v1' PatchMerging2D | 'v2' 2x2 | 'v3' 3x3
    patchembed_version: str = "v1"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.patchembed_version == "v1":
            x = Conv(self.dims[0], self.patch_size, stride=self.patch_size,
                     use_bias=True, name="patch_embed_0", **kw)(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                             name="patch_embed_2")(x)
        else:
            s = self.patch_size // 2
            x = Conv(self.dims[0] // 2, s + 1, stride=s, padding=1,
                     use_bias=True, name="patch_embed_0", **kw)(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                             name="patch_embed_2")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = Conv(self.dims[0], s + 1, stride=s, padding=1, use_bias=True,
                     name="patch_embed_5", **kw)(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                             name="patch_embed_7")(x)

        for li, depth in enumerate(self.depths):
            for bi in range(depth):
                x = VSSBlock(self.dims[li], self.num_heads[li], self.expand_k,
                             self.expand_v, self.rope_mode, self.mlp_ratio,
                             self.gmlp, name=f"layers_{li}_blocks_{bi}",
                             **kw)(x)
            if li < len(self.depths) - 1:
                if self.downsample_version == "v1":
                    x = PatchMerging2D(self.dims[li], self.dims[li + 1],
                                       name=f"layers_{li}_downsample", **kw)(x)
                else:
                    k = 2 if self.downsample_version == "v2" else 3
                    p = 0 if self.downsample_version == "v2" else 1
                    x = Conv(self.dims[li + 1], k, stride=2, padding=p,
                             use_bias=True,
                             name=f"layers_{li}_downsample_1", **kw)(x)
                    x = nn.LayerNorm(epsilon=1e-5,
                                     param_dtype=self.param_dtype,
                                     name=f"layers_{li}_downsample_3")(x)

        x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="classifier_norm")(x)
        feat = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="classifier_head", **kw)(feat)
        return feat
