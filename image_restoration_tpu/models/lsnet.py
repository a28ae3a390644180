"""LSNet (CVPR'25 "see large, focus small"), TPU-native (reference
20251113_lsnet_xy/model/{lsnet.py,ska.py}).

Backbone of Conv+BN blocks: RepVGGDW + SqueezeExcite on even depths; LSConv
(LKP large-kernel perception predicting per-pixel 3x3 kernels applied by the
SKA dynamic conv — ops/ska.py + the Pallas kernel) on odd depths; LeViT-style
attention with trained relative-position biases at stage 3; BN+Linear head.
The detection/segmentation trees in the reference are mmdet/mmseg config
shims around this same backbone.
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.layernorm import BatchNorm2d
from image_restoration_tpu.ops.common import GroupedConv
from image_restoration_tpu.ops.ska import ska


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm (lsnet.py:12-34)."""

    out: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = GroupedConv(self.out, (self.ks, self.ks), strides=(self.stride,) * 2,
                    padding=[(self.pad, self.pad)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype, name="c")(x)
        return BatchNorm2d(param_dtype=self.param_dtype, name="bn")(x, train=train)


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite(ed, 0.25): GAP -> conv -> ReLU -> conv -> sigmoid."""

    dim: int
    rd_ratio: float = 0.25
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        rd = int(self.dim * self.rd_ratio)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), use_bias=True, name="conv_reduce", **kw)(s)
        s = nn.relu(s)
        s = nn.Conv(self.dim, (1, 1), use_bias=True, name="conv_expand", **kw)(s)
        return x * jax.nn.sigmoid(s)


class RepVGGDW(nn.Module):
    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        a = ConvBN(self.dim, 3, 1, 1, self.dim, name="conv", **kw)(x, train)
        b = ConvBN(self.dim, 1, 1, 0, self.dim, name="conv1", **kw)(x, train)
        return a + b + x


class FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvBN(self.hidden, name="pw1", **kw)(x, train)
        return ConvBN(self.dim, name="pw2", **kw)(nn.relu(h), train)


class LKP(nn.Module):
    """Large-kernel perception predicting per-pixel sks^2 weights
    (lsnet.py:177-196)."""

    dim: int
    lks: int = 7
    sks: int = 3
    groups: int = 8
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d2 = self.dim // 2
        h = nn.relu(ConvBN(d2, name="cv1", **kw)(x, train))
        h = ConvBN(d2, self.lks, 1, (self.lks - 1) // 2, d2, name="cv2", **kw)(h, train)
        h = nn.relu(ConvBN(d2, name="cv3", **kw)(h, train))
        wch = self.sks**2 * self.dim // self.groups
        h = nn.Conv(wch, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="cv4")(h)
        # GroupNorm(num_groups = dim//groups) over (sks^2 * dim/groups) chans:
        # each group = sks^2 consecutive channels (one pixel-kernel)
        h = nn.GroupNorm(num_groups=self.dim // self.groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm")(h)
        b, hh, ww, _ = h.shape
        # torch view (b, dim/groups, sks^2, h, w): channel-major = wc-major
        return h.reshape(b, hh, ww, self.dim // self.groups, self.sks**2)


class LSConv(nn.Module):
    dim: int
    use_pallas_ska: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        w = LKP(self.dim, name="lkp", **kw)(x, train)
        y = ska(x, w, use_pallas=self.use_pallas_ska)
        y = BatchNorm2d(param_dtype=self.param_dtype, name="bn")(y, train=train)
        return y + x


class LeViTAttention(nn.Module):
    """LeViT-style attention with relative-position biases (lsnet.py:86-143)."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h, w, _ = x.shape
        nh, kd = self.num_heads, self.key_dim
        nh_kd = nh * kd
        dd = int(self.attn_ratio * kd)
        dh = dd * nh

        points = list(itertools.product(range(self.resolution), range(self.resolution)))
        offsets = {}
        idxs = []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        bias_idx = np.asarray(idxs, np.int32).reshape(len(points), len(points))
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (nh, len(offsets)), self.param_dtype)

        qkv = ConvBN(dh + 2 * nh_kd, name="qkv", **kw)(x, train)
        q, k, v = jnp.split(qkv, [nh_kd, 2 * nh_kd], axis=-1)
        q = ConvBN(nh_kd, 3, 1, 1, nh_kd, name="dw", **kw)(q, train)
        n = h * w
        # channel layout is head-major: (head, kd)
        q = q.reshape(b, n, nh, kd)
        k = k.reshape(b, n, nh, kd)
        v = v.reshape(b, n, nh, dd)
        # attn[i, j] = q_i . k_j * scale + bias[i, j]; out[i] = sum_j attn v_j
        attn = jnp.einsum("bihk,bjhk->bhij", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        attn = attn + biases[:, bias_idx[:n][:, :n]].astype(jnp.float32)[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, dh)
        out = nn.relu(out)
        return ConvBN(self.dim, name="proj_1", **kw)(out, train)


class LSBlock(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    stage: int
    depth_idx: int
    use_pallas_ska: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.depth_idx % 2 == 0:
            x = RepVGGDW(self.dim, name="mixer", **kw)(x, train)
            x = SqueezeExcite(self.dim, name="se", **kw)(x)
        elif self.stage == 3:
            x = x + LeViTAttention(self.dim, self.key_dim, self.num_heads,
                                   self.attn_ratio, self.resolution,
                                   name="mixer_m", **kw)(x, train)
        else:
            x = LSConv(self.dim, self.use_pallas_ska, name="mixer", **kw)(x, train)
        return x + FFN(self.dim, self.dim * 2, name="ffn_m", **kw)(x, train)


@register_model("lsnet")
class LSNet(nn.Module):
    """lsnet.py:231-293. variants: t=(64,128,192,256)/(0? depths (1,2,3,4)?);
    s=(96,192,320,448)/(1,2,8,10); b=(128,256,384,512)/(4,6,8,10)."""

    img_size: int = 224
    patch_size: int = 8
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: Sequence[int] = (64, 128, 192, 256)
    key_dim: Sequence[int] = (16, 16, 16, 16)
    depth: Sequence[int] = (1, 2, 3, 4)
    num_heads: Sequence[int] = (4, 4, 4, 4)
    use_pallas_ska: bool = False
    features: bool = False  # return the 4 stage maps (strides 8/16/32/64)
    # instead of logits — the mmdet/mmseg backbone mode (out_indices=(0,1,2,3))
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ed = self.embed_dim
        x = x.astype(self.dtype) if self.dtype is not None else x
        x = ConvBN(ed[0] // 4, 3, 2, 1, name="patch_embed_0", **kw)(x, train)
        x = nn.relu(x)
        x = ConvBN(ed[0] // 2, 3, 2, 1, name="patch_embed_2", **kw)(x, train)
        x = nn.relu(x)
        x = ConvBN(ed[0], 3, 2, 1, name="patch_embed_4", **kw)(x, train)

        resolution = self.img_size // self.patch_size
        ar = [ed[i] / (self.key_dim[i] * self.num_heads[i]) for i in range(4)]
        stage_feats = []
        for i in range(4):
            off = 0
            if i > 0:  # downsample pair prepended to this stage's Sequential
                x = ConvBN(ed[i - 1], 3, 2, 1, ed[i - 1],
                           name=f"blocks{i+1}_0", **kw)(x, train)
                x = ConvBN(ed[i], 1, 1, 0, name=f"blocks{i+1}_1", **kw)(x, train)
                resolution = (resolution - 1) // 2 + 1
                off = 2
            for d in range(self.depth[i]):
                x = LSBlock(ed[i], self.key_dim[i], self.num_heads[i], ar[i],
                            resolution, stage=i, depth_idx=d,
                            use_pallas_ska=self.use_pallas_ska,
                            name=f"blocks{i+1}_{off + d}", **kw)(x, train)
            stage_feats.append(x)
        if self.features:
            return stage_feats

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes > 0:
            x = BatchNorm1d(param_dtype=self.param_dtype, name="head_bn")(x, train)
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_l")(x)
        return x.astype(jnp.float32)


class BatchNorm1d(nn.Module):
    eps: float = 1e-5
    momentum: float = 0.1
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf, axis=0)
            var = jnp.var(xf, axis=0)
            if not self.is_initializing():
                n = x.shape[0]
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * var * n / max(n - 1, 1)
        else:
            mean, var = ra_mean.value, ra_var.value
        return ((xf - mean) / jnp.sqrt(var + self.eps) * w + b).astype(x.dtype)


def lsnet_key_map(key: str):
    """blocks1.0.mixer.m.<..> (Residual wrapper) -> blocks1_0/mixer_m;
    ffn is Residual(FFN) -> ffn_m; head bn/l split."""
    k = key
    k = k.replace(".mixer.m.", ".mixer_m.")
    k = k.replace(".ffn.m.", ".ffn_m.")
    k = k.replace("head.bn.", "head_bn.").replace("head.l.", "head_l.")
    if "attention_bias_idxs" in k:
        return None
    # LeViT proj Sequential: proj.0 = ReLU, proj.1 = Conv2d_BN
    k = k.replace(".proj.1.", ".proj_1.")
    return k
