"""ViG — Vision Gated-Linear-Attention backbone, TPU-native (flax).

Re-designed from the behavior of the reference ``vig.py`` (961 LoC, the
owner's GLA experiment importing the ``fla`` Triton package):

* ``GatedLinearAttention`` (:241-464): depthwise 3x3 ``in_proj`` (+SiLU) over
  the 2D patch grid (with the cls-token splice quirk, :356-362), fused qkv
  projection, low-rank gate projection producing forward+backward key-decay
  gates (``logsigmoid/16``), bidirectional GLA scan (ops/gla.py replaces the
  fla Triton kernels), per-head RMSNorms on the scan output and the local
  conv branch, sigmoid output gate blending them (:447-454), output proj.
* 2D RoPE (:43-188): '2dv0' (axial cos/sin) and '2dv1' (complex polar over
  x/y frequency pairs) variants.
* ``GLABlock`` (:530-618): RMSNorm -> GLA -> fused prenorm-residual RMSNorm
  -> (Swi)GLU MLP, optional layer scale.
* ``ViG`` (:705-912): V1 (single conv) / V2 (two-conv) patch embeds, optional
  cls token (end or middle, :848-857), absolute pos embed with bicubic
  resize, avgpool or cls-token classification head.

The reference defaults ``if_cls_token=True`` with ``classification_mode=
'avgpool'`` — a combination whose head reshape cannot run (:897-898 reshapes
P+1 tokens into the patch grid); the build defaults to the working
``mid_clstok`` configuration and supports cls-free avgpool.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.gla import bidirectional_gla


class RMSNorm(nn.Module):
    """fla.modules.RMSNorm: x / sqrt(mean(x^2) + eps) * weight."""

    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y * w).astype(x.dtype)


def rope_2dv0(t, h, w, head_dim, theta: float = 10000.0):
    """RotaryEmbeddingFast (vig.py:117-188): axial cos/sin rotation.
    t: (B, H, N, D)."""
    half = head_dim // 2
    freq = 1.0 / (theta ** (np.arange(0, half, 2, dtype=np.float32) / half))
    th = np.arange(h, dtype=np.float32) / h * half
    tw = np.arange(w, dtype=np.float32) / w * half
    ph = np.tile(np.outer(th, freq), (1, 2))  # (h, half)
    pw = np.tile(np.outer(tw, freq), (1, 2))
    pos = np.concatenate([
        np.broadcast_to(ph[:, None, :], (h, w, half)),
        np.broadcast_to(pw[None, :, :], (h, w, half)),
    ], axis=-1).reshape(h * w, head_dim)
    cos = jnp.asarray(np.cos(pos), t.dtype)
    sin = jnp.asarray(np.sin(pos), t.dtype)
    tr = t.reshape(*t.shape[:-1], -1, 2)
    rot = jnp.stack([-tr[..., 1], tr[..., 0]], axis=-1).reshape(t.shape)
    return t * cos + rot * sin


def rope_2dv1(t, h, w, head_dim, theta: float = 10000.0, base_size: int = 14):
    """RotaryEmbeddingFast2D (vig.py:43-115): interleaved complex x/y pairs.
    t: (B, N, Hh, D) token-major like the reference call site."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4, dtype=np.float32)[:quarter]
                             / head_dim))
    pos = np.arange(h * w)
    x_pos = (pos % w) * (base_size / w)
    y_pos = (pos // w) * (base_size / h)
    xf = np.outer(x_pos, freqs)  # (N, quarter)
    yf = np.outer(y_pos, freqs)
    # freqs_cis = interleave(x_cis, y_cis) -> (N, half) complex
    ang = np.stack([xf, yf], axis=-1).reshape(h * w, -1)
    cis = np.exp(1j * ang).astype(np.complex64)
    tc = t.astype(jnp.float32).reshape(*t.shape[:-1], -1, 2)
    tc = jax.lax.complex(tc[..., 0], tc[..., 1])  # (B, N, Hh, half)
    cisj = jnp.asarray(cis)[None, :, None, :]
    out = tc * cisj
    out = jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)
    return out.reshape(t.shape).astype(t.dtype)


class GatedLinearAttention(nn.Module):
    """vig.py:241-464 (bidirectional train-path semantics, deterministic)."""

    d_model: int
    num_heads: int = 4
    expand_k: float = 0.5
    expand_v: float = 1.0
    gate_low_rank_dim: int = 16
    gate_logit_normalizer: int = 16
    norm_eps: float = 1e-6
    rope_mode: str = "none"
    use_act_in_conv: bool = True
    use_bias_in_dwconv: bool = False
    clamp_min: Optional[float] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, patch_resolution, token_position: Optional[int] = None):
        b, l, c = x.shape
        h, w = patch_resolution
        key_dim = int(self.d_model * self.expand_k)
        value_dim = int(self.d_model * self.expand_v)
        heads = self.num_heads
        hk = key_dim // heads
        hv = value_dim // heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # local dwconv branch over the 2D grid; cls token spliced around it
        # (vig.py:356-362)
        if token_position is not None:
            tp = token_position % l
            patches = jnp.concatenate([x[:, :tp], x[:, tp + 1 :]], axis=1)
        else:
            tp = None
            patches = x
        x2d = patches.reshape(b, h, w, c)
        conv = Conv(c, 3, padding=1, groups=c, use_bias=self.use_bias_in_dwconv,
                    name="in_proj_0", **kw)(x2d)
        if self.use_act_in_conv:
            conv = jax.nn.silu(conv)
        conv = conv.reshape(b, h * w, c)
        if tp is not None:
            local_out = jnp.concatenate(
                [conv[:, :tp], x[:, tp : tp + 1], conv[:, tp:]], axis=1)
        else:
            local_out = conv
        xs = local_out

        qkv = nn.Dense(2 * key_dim + value_dim, use_bias=False,
                       name="qkv_proj", **kw)(xs)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        gk = nn.Dense(self.gate_low_rank_dim, use_bias=False,
                      name="gk_proj_0", **kw)(xs)
        gk = nn.Dense(2 * key_dim, use_bias=True, name="gk_proj_1", **kw)(gk)
        fw_gk, bw_gk = jnp.split(gk, 2, axis=-1)

        def heads_km(t, hd):
            return t.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)

        if self.rope_mode in ("2dv0", "2dv1"):
            q1 = q.reshape(b, l, heads, hk)
            k1 = k.reshape(b, l, heads, hk)
            if self.rope_mode == "2dv0":
                qh = rope_2dv0(q1.transpose(0, 2, 1, 3), h, w, hk)
                kh = rope_2dv0(k1.transpose(0, 2, 1, 3), h, w, hk)
            else:
                if tp is not None:
                    qp = jnp.concatenate([q1[:, :tp], q1[:, tp + 1 :]], axis=1)
                    kp = jnp.concatenate([k1[:, :tp], k1[:, tp + 1 :]], axis=1)
                    qr = rope_2dv1(qp, h, w, hk)
                    kr = rope_2dv1(kp, h, w, hk)
                    # reference splice quirk (vig.py:390-395): q1 is
                    # reassigned cls-free BEFORE the re-insert, so the token
                    # spliced back at tp is the UN-rotated PATCH projection
                    # — the cls projection itself is dropped
                    qh = jnp.concatenate(
                        [qr[:, :tp], qp[:, tp : tp + 1], qr[:, tp:]], axis=1)
                    kh = jnp.concatenate(
                        [kr[:, :tp], kp[:, tp : tp + 1], kr[:, tp:]], axis=1)
                else:
                    qh = rope_2dv1(q1, h, w, hk)
                    kh = rope_2dv1(k1, h, w, hk)
                qh = qh.transpose(0, 2, 1, 3)
                kh = kh.transpose(0, 2, 1, 3)
        else:
            qh = heads_km(q, hk)
            kh = heads_km(k, hk)
        vh = heads_km(v, hv)
        gf = heads_km(fw_gk, hk)
        gb = heads_km(bw_gk, hk)

        logsig = lambda t: jax.nn.log_sigmoid(t.astype(jnp.float32))
        gf = logsig(gf) / self.gate_logit_normalizer
        gb = logsig(gb) / self.gate_logit_normalizer
        if self.clamp_min is not None:
            gf = jnp.maximum(gf, self.clamp_min)
            gb = jnp.maximum(gb, self.clamp_min)

        o = bidirectional_gla(qh, kh, vh, gf, gb)  # (B, H, L, hv)
        o = o.transpose(0, 2, 1, 3)  # (B, L, H, hv)

        local_h = local_out.reshape(b, l, heads, c // heads)
        local_h = RMSNorm(self.norm_eps, self.param_dtype, name="l_norm")(local_h)
        o = RMSNorm(self.norm_eps, self.param_dtype, name="g_norm")(o)
        g = jax.nn.sigmoid(nn.Dense(value_dim, use_bias=True,
                                    name="g_proj", **kw)(xs))
        g = g.reshape(b, l, heads, hv)
        o = o * g + local_h * (1 - g)
        o = o.reshape(b, l, value_dim)
        return nn.Dense(self.d_model, use_bias=False, name="o_proj", **kw)(o)


class GLAMLP(nn.Module):
    """SwiGLU MLP (vig.py:469-497)."""

    hidden_size: int
    intermediate_size: Optional[int] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = self.intermediate_size
        if inter is None:
            inter = int(self.hidden_size * 4 * 2 / 3)
            inter = 256 * ((inter + 255) // 256)
        y = nn.Dense(inter * 2, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="gate_proj")(x)
        gate, y = jnp.split(y, 2, axis=-1)
        return nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="down_proj")(jax.nn.silu(gate) * y)


class GLAMlpPlain(nn.Module):
    """vig.py:499-527 (hidden = 4x, swish)."""

    hidden_size: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        hdn = self.hidden_size * 4
        x = nn.Dense(hdn, name="fc1", **kw)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.hidden_size, name="fc2", **kw)(x)


class GLABlock(nn.Module):
    """vig.py:530-618 with the fused prenorm-residual RMSNorm."""

    hidden_size: int
    num_heads: int
    expand_k: float = 0.5
    expand_v: float = 1.0
    rope_mode: str = "none"
    use_swiglu: bool = False
    init_values: Optional[float] = None
    norm_eps: float = 1e-6
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, patch_resolution, token_position=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        h = RMSNorm(self.norm_eps, self.param_dtype, name="attn_norm")(x)
        h = GatedLinearAttention(self.hidden_size, self.num_heads,
                                 self.expand_k, self.expand_v,
                                 rope_mode=self.rope_mode,
                                 norm_eps=self.norm_eps, name="attn",
                                 **kw)(h, patch_resolution, token_position)
        if self.init_values is not None:
            g1 = self.param("gamma1", nn.initializers.constant(self.init_values),
                            (self.hidden_size,), self.param_dtype)
            h = h * g1
        residual = h + residual
        h = RMSNorm(self.norm_eps, self.param_dtype, name="mlp_norm")(residual)
        mlp = (GLAMLP(self.hidden_size, name="mlp", **kw) if self.use_swiglu
               else GLAMlpPlain(self.hidden_size, name="mlp", **kw))
        h = mlp(h)
        if self.init_values is not None:
            g2 = self.param("gamma2", nn.initializers.constant(self.init_values),
                            (self.hidden_size,), self.param_dtype)
            h = h * g2
        return residual + h


@register_model("vig")
class ViG(nn.Module):
    """vig.py:705-912."""

    img_size: int = 224
    patch_size: int = 16
    depth: int = 12
    num_heads: int = 2
    embed_dim: int = 192
    num_classes: int = 1000
    classification_mode: str = "mid_clstok"  # or "avgpool", "feat"
    rope_mode: str = "none"
    expand_k: float = 0.5
    expand_v: float = 1.0
    use_swiglu: bool = False
    if_abs_pos_embed: bool = True
    init_values: Optional[float] = None
    patch_embed_version: str = "v1"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = x.shape[0]
        if self.patch_embed_version == "v1":
            x = Conv(self.embed_dim, self.patch_size, stride=self.patch_size,
                     use_bias=True, name="patch_embed_proj", **kw)(x)
        else:  # v2: two strided convs with channel LN + swish between
            s = self.patch_size // 2
            x = Conv(self.embed_dim // 2, s + 1, stride=s, padding=1,
                     use_bias=True, name="patch_embed_proj_0", **kw)(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                             name="patch_embed_proj_1")(x)
            x = jax.nn.silu(x)
            x = Conv(self.embed_dim, 3, stride=2, padding=1, use_bias=True,
                     name="patch_embed_proj_3", **kw)(x)
            x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                             name="patch_embed_proj_4")(x)
        hh, ww = x.shape[1:3]
        t = x.reshape(b, hh * ww, self.embed_dim)
        m = t.shape[1]

        use_cls = self.classification_mode == "mid_clstok"
        token_position = None
        if use_cls:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, self.embed_dim), self.param_dtype)
            clsb = jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(t.dtype)
            token_position = m // 2
            t = jnp.concatenate(
                [t[:, :token_position], clsb, t[:, token_position:]], axis=1)

        if self.if_abs_pos_embed:
            grid = self.img_size // self.patch_size
            n_pos = grid * grid + (1 if use_cls else 0)
            pe = self.param("pos_embed", nn.initializers.normal(0.02),
                            (1, n_pos, self.embed_dim), self.param_dtype)
            if (hh, ww) != (grid, grid):
                # bicubic resize of the grid part (vig.py:915-959)
                pg = pe[:, : grid * grid].reshape(1, grid, grid, self.embed_dim)
                pg = jax.image.resize(pg.astype(jnp.float32),
                                      (1, hh, ww, self.embed_dim), "cubic")
                pe = jnp.concatenate(
                    [pg.reshape(1, hh * ww, self.embed_dim),
                     pe[:, grid * grid :].astype(jnp.float32)], axis=1)
            t = t + pe.astype(t.dtype)

        for i in range(self.depth):
            t = GLABlock(self.embed_dim, self.num_heads, self.expand_k,
                         self.expand_v, rope_mode=self.rope_mode,
                         use_swiglu=self.use_swiglu,
                         init_values=self.init_values,
                         name=f"blocks_{i}", **kw)(t, (hh, ww), token_position)
        t = RMSNorm(param_dtype=self.param_dtype, name="norm")(t)

        if self.classification_mode == "avgpool":
            feat = jnp.mean(t, axis=1)
        elif self.classification_mode == "feat":
            return t.reshape(b, hh, ww, self.embed_dim)
        else:
            feat = t[:, token_position]
        if self.num_classes > 0:
            return nn.Dense(self.num_classes, name="head", **kw)(feat)
        return feat
