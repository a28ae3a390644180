"""IPT with AdaptIR parameter-efficient adapters, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference ``AdaptIR-main/net/ipt.py``
(+ ``net/common.py`` EDSR blocks):

* ``IPT`` (:48-110): per-task conv heads (conv + 2 ResBlocks with 5x5 convs),
  a 48x48 VisionTransformer body over 3x3 patch tokens (12 enc + 12 dec
  layers, learned positional encoding, per-task learned decoder queries),
  per-task pixel-shuffle tails (scales 2/3/4/1/1/1), EDSR MeanShift in/out
  (frozen eye convs -> computed functionally here, rgb_range 255).
* ``AdaptIR`` (:508-593): the frozen-backbone adapter — BN head, FFT
  amplitude/phase per-channel modulation branch, low-rank (A@B) depthwise 3x3
  local branch, softmax attention-pooled channel score, cross channel/spatial
  gates, zero-init tail. Runs parallel to each FFN (:425-427, :486-489).

The torch eval path tiles via ``forward_chop`` (:115-248); the TPU build's
equivalent overlap-shave tiling lives in eval/tiled.py (``chop_forward``) —
here ``__call__`` is the static-shape ``forward_train`` graph.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, conv2d, gelu_exact
from image_restoration_tpu.ops.layernorm import BatchNorm2d, WithBiasLayerNorm
from image_restoration_tpu.ops.resample import pixel_shuffle

RGB_MEAN = (0.4488, 0.4371, 0.4040)  # DIV2K (net/common.py:18)

TASK_MAP = {"lr4_noise30": 2, "lr4_jpeg30": 2, "sr_2": 0, "sr_3": 1, "sr_4": 2,
            "derainH": 3, "derainL": 3, "denoise_30": 4, "denoise_50": 5,
            "low_light": 5}


class ResBlock(nn.Module):
    """conv-relu-conv + x (net/common.py:40-61), 5x5 in the IPT heads."""

    n_feats: int
    kernel: int = 5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Conv(self.n_feats, self.kernel, padding=self.kernel // 2,
                 use_bias=True, name="body_0", **kw)(x)
        h = nn.relu(h)
        h = Conv(self.n_feats, self.kernel, padding=self.kernel // 2,
                 use_bias=True, name="body_2", **kw)(h)
        return x + h


class AdaptIRAdapter(nn.Module):
    """AdaptIR (ipt.py:508-593): tri-branch low-rank/frequency/channel
    adapter over (B, L, C) tokens of an HxW grid."""

    d_model: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, l, c = x.shape
        h = w = int(math.isqrt(l))
        hidden = self.d_model // 24
        rank = hidden // 2
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        xi = x.reshape(b, h, w, c)
        xi = Conv(hidden, 1, use_bias=True, name="head", **kw)(xi)
        xi = BatchNorm2d(name="BN", **kw)(xi, train=train)

        # frequency branch (:564-573): per-channel amp/phase 1x1 scales
        xf = jnp.fft.rfft2(xi.astype(jnp.float32), axes=(1, 2), norm="ortho")
        mag, pha = jnp.abs(xf), jnp.angle(xf)
        amp_w = self.param("amp_fuse_weight", nn.initializers.ones,
                           (hidden,), self.param_dtype)
        amp_b = self.param("amp_fuse_bias", nn.initializers.zeros,
                           (hidden,), self.param_dtype)
        pha_w = self.param("pha_fuse_weight", nn.initializers.ones,
                           (hidden,), self.param_dtype)
        pha_b = self.param("pha_fuse_bias", nn.initializers.zeros,
                           (hidden,), self.param_dtype)
        mag = mag * amp_w + amp_b
        pha = pha * pha_w + pha_b
        gx = mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))
        global_x = jnp.abs(
            jnp.fft.irfft2(gx, s=(h, w), axes=(1, 2), norm="ortho")
        ).astype(xi.dtype)

        # low-rank depthwise conv branch (:519-524, :575-577)
        def kaiming(key, shape, dtype=jnp.float32):
            fan_in = shape[1]
            bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))  # a=sqrt(5)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        wa = self.param("conv_weight_A", kaiming, (hidden, rank),
                        self.param_dtype)
        wb = self.param("conv_weight_B", kaiming, (rank, 9), self.param_dtype)
        cb = self.param("conv_bias", nn.initializers.zeros, (hidden,),
                        self.param_dtype)
        wk = (wa @ wb).reshape(hidden, 1, 3, 3)  # OIHW, groups=hidden
        wk = wk.transpose(2, 3, 1, 0)  # HWIO
        local_x = conv2d(xi, wk.astype(xi.dtype), bias=cb.astype(xi.dtype),
                         padding=1, groups=hidden)

        # attention-pooled channel score (:579-585)
        score = Conv(1, 1, use_bias=True, name="compress", **kw)(xi)
        score = jax.nn.softmax(score.reshape(b, l, 1), axis=1)
        pooled = jnp.einsum("blc,blo->bc", xi.reshape(b, l, hidden), score)
        pooled = nn.Dense(hidden // 2, name="proj_0", **kw)(pooled)
        pooled = gelu_exact(pooled)
        pooled = nn.Dense(hidden, name="proj_2", **kw)(pooled)
        channel_score = pooled[:, None, None, :]

        # cross gates (:543-555, :587-589), both zero-init -> sigmoid(0)=.5
        cg = jnp.mean(global_x, axis=(1, 2), keepdims=True)
        cg = Conv(hidden // 8, 1, use_bias=True,
                  name="channel_interaction_1", **kw)(cg)
        cg = Conv(hidden, 1, use_bias=True, name="channel_interaction_3",
                  **kw)(gelu_exact(cg))
        channel_gate = jax.nn.sigmoid(cg)
        sg = Conv(1, 1, use_bias=True, name="spatial_interaction", **kw)(local_x)
        spatial_gate = jax.nn.sigmoid(sg)
        spatial_x = channel_gate * local_x + spatial_gate * global_x

        out = nn.Conv(self.d_model, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name="tail")(channel_score * spatial_x)
        return out.reshape(b, l, self.d_model)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention(bias=False) semantics: packed qkv
    in-projection, scaled dot-product, out-projection (ipt.py:399)."""

    d_model: int
    num_heads: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        b, lq, c = q.shape
        heads, ch = self.num_heads, c // self.num_heads
        win = self.param("in_proj_weight",
                         nn.initializers.xavier_uniform(), (3 * c, c),
                         self.param_dtype)
        dt = q.dtype if self.dtype is None else self.dtype
        wq, wk, wv = jnp.split(win.astype(dt), 3, axis=0)
        qh = (q @ wq.T).reshape(b, lq, heads, ch)
        kh = (k @ wk.T).reshape(b, -1, heads, ch)
        vh = (v @ wv.T).reshape(b, -1, heads, ch)
        attn = jnp.einsum("bqhc,bkhc->bhqk", qh, kh,
                          preferred_element_type=jnp.float32) * (ch ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, vh,
                         preferred_element_type=jnp.float32).astype(dt)
        out = out.reshape(b, lq, c)
        return nn.Dense(c, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-norm encoder layer with a parallel AdaptIR branch (ipt.py:394-428)."""

    d_model: int
    num_heads: int
    hidden_dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        s2 = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm1")(src)
        qk = s2 if pos is None else s2 + pos
        a = MultiheadAttention(self.d_model, self.num_heads,
                               name="self_attn", **kw)(qk, qk, s2)
        src = src + a
        s2 = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm2")(src)
        adapt = AdaptIRAdapter(self.d_model, name="adaptir", **kw)(s2, train=train)
        f = nn.Dense(self.hidden_dim, name="linear1", **kw)(s2)
        f = nn.Dense(self.d_model, name="linear2", **kw)(nn.relu(f))
        return src + f + adapt


class DecoderLayer(nn.Module):
    """ipt.py:444-490."""

    d_model: int
    num_heads: int
    hidden_dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        t2 = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm1")(tgt)
        qk = t2 + query_pos
        tgt = tgt + MultiheadAttention(self.d_model, self.num_heads,
                                       name="self_attn", **kw)(qk, qk, t2)
        t2 = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm2")(tgt)
        tgt = tgt + MultiheadAttention(self.d_model, self.num_heads,
                                       name="multihead_attn", **kw)(
            t2 + query_pos, memory, memory)
        t2 = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm3")(tgt)
        adapt = AdaptIRAdapter(self.d_model, name="adaptir", **kw)(t2, train=train)
        f = nn.Dense(self.hidden_dim, name="linear1", **kw)(t2)
        f = nn.Dense(self.d_model, name="linear2", **kw)(nn.relu(f))
        return tgt + f + adapt


class VisionTransformer(nn.Module):
    """ipt.py:250-358: 3x3 patch tokens, 12+12 layers, learned pos encoding,
    per-task learned decoder query embeddings."""

    img_dim: int = 48
    patch_dim: int = 3
    num_channels: int = 64
    embedding_dim: int = 576
    num_heads: int = 12
    num_layers: int = 12
    hidden_dim: int = 2304
    num_queries: int = 6
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_idx: int, train: bool = False):
        b, h, w, c = x.shape
        p = self.patch_dim
        nh, nw = h // p, w // p
        l = nh * nw
        ed = self.embedding_dim
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # unfold: token content ordered (c, ki, kj) like torch F.unfold
        t = x.reshape(b, nh, p, nw, p, c)
        t = t.transpose(0, 1, 3, 5, 2, 4).reshape(b, l, c * p * p)

        t = t + nn.Dense(ed, name="linear_encoding", **kw)(t)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, ed * l), self.param_dtype)
        qpos = query_embed[query_idx].reshape(l, ed)[None, :, :]
        qpos = jnp.broadcast_to(qpos, (b, l, ed)).astype(t.dtype)

        pe = self.param("position_encoding", nn.initializers.normal(1.0),
                        (l, ed), self.param_dtype)
        t = t + pe[None].astype(t.dtype)

        for i in range(self.num_layers):
            t = EncoderLayer(ed, self.num_heads, self.hidden_dim,
                             name=f"encoder_layers_{i}", **kw)(t, None,
                                                               train=train)
        mem = t
        for i in range(self.num_layers):
            t = DecoderLayer(ed, self.num_heads, self.hidden_dim,
                             name=f"decoder_layers_{i}", **kw)(t, mem, qpos,
                                                               train=train)

        f = nn.Dense(self.hidden_dim, name="mlp_head_0", **kw)(t)
        f = nn.Dense(c * p * p, name="mlp_head_3", **kw)(nn.relu(f))
        t = t + f  # out_dim == flatten_dim == embedding_dim here

        # fold back
        t = t.reshape(b, nh, nw, c, p, p).transpose(0, 1, 4, 2, 5, 3)
        return t.reshape(b, h, w, c)


@register_model("ipt_adaptir")
@register_model("ipt")
class IPT(nn.Module):
    """ipt.py:48-110: multi-task IPT; ``task_idx`` selects head/tail/queries.

    Input/output in [0, 1] (the reference multiplies by 255 in/out,
    ipt.py:92-96).
    """

    n_feats: int = 64
    scales: Sequence[int] = (2, 3, 4, 1, 1, 1)
    rgb_range: float = 255.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, task_idx: int = 5, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mean = jnp.asarray(RGB_MEAN, x.dtype) * self.rgb_range
        x = x * self.rgb_range - mean  # sub_mean (std=1)

        h = Conv(self.n_feats, 3, padding=1, use_bias=True,
                 name=f"head_{task_idx}_0", **kw)(x)
        h = ResBlock(self.n_feats, 5, name=f"head_{task_idx}_1", **kw)(h)
        h = ResBlock(self.n_feats, 5, name=f"head_{task_idx}_2", **kw)(h)

        res = VisionTransformer(num_channels=self.n_feats,
                                embedding_dim=self.n_feats * 9,
                                hidden_dim=self.n_feats * 9 * 4,
                                num_queries=len(self.scales),
                                name="body", **kw)(h, task_idx, train=train)
        res = res + h

        s = self.scales[task_idx]
        t = res
        up = 0
        if s in (2, 4):
            for _ in range(int(math.log2(s))):
                t = Conv(4 * self.n_feats, 3, padding=1, use_bias=True,
                         name=f"tail_{task_idx}_0_{up}", **kw)(t)
                t = pixel_shuffle(t, 2)
                up += 2
        elif s == 3:
            t = Conv(9 * self.n_feats, 3, padding=1, use_bias=True,
                     name=f"tail_{task_idx}_0_0", **kw)(t)
            t = pixel_shuffle(t, 3)
        out = Conv(3, 3, padding=1, use_bias=True,
                   name=f"tail_{task_idx}_1", **kw)(t)
        out = out + mean  # add_mean
        return (out / self.rgb_range).astype(jnp.float32)


def ipt_key_map(key: str):
    """Map torch IPT keys onto the flax tree: drop frozen MeanShift convs,
    flatten module paths."""
    if key.startswith(("sub_mean", "add_mean")):
        return None
    if key == "body.query_embed.weight":
        return "body.query_embed"
    if key == "body.position_encoding.pe.weight":
        return "body.position_encoding"
    if key.endswith("position_encoding.position_ids"):
        return None
    key = key.replace("body.encoder.layers.", "body.encoder_layers.")
    key = key.replace("body.decoder.layers.", "body.decoder_layers.")
    key = key.replace(".amp_fuse.weight", ".amp_fuse_weight")
    key = key.replace(".amp_fuse.bias", ".amp_fuse_bias")
    key = key.replace(".pha_fuse.weight", ".pha_fuse_weight")
    key = key.replace(".pha_fuse.bias", ".pha_fuse_bias")
    key = key.replace(".channel_interaction.1.", ".channel_interaction_1.")
    key = key.replace(".channel_interaction.3.", ".channel_interaction_3.")
    key = key.replace(".proj.0.", ".proj_0.")
    key = key.replace(".proj.2.", ".proj_2.")
    key = key.replace(".mlp_head.0.", ".mlp_head_0.")
    key = key.replace(".mlp_head.3.", ".mlp_head_3.")
    return key
