"""TransWeather, TPU-native (reference TransWeather-main/transweather_model.py
+ base_networks.py).

SegFormer-style hierarchical encoder (4 stages, overlap patch embeds stride
4/2/2/2, spatial-reduction attention) with *intra-patch* transformer branches
added into each next stage (:138-208), a 1-stage transformer decoder with 48
learnable task queries nearest-resized to the kv length (:382-450), and a
conv-projection tail of transposed convs + residual blocks with dense skip
fusions (:649-764), tanh output head (:825-835).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv, gelu_exact
from image_restoration_tpu.ops.layernorm import WithBiasLayerNorm


def drop_path(x, rate: float, rng, train: bool):
    """Stochastic depth on the batch dim (timm DropPath)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x / keep * mask


class PatchEmbed(nn.Module):
    """Overlap patch embed: conv(k, stride, pad k//2) -> tokens -> LN
    (transweather_model.py:215-256). Returns (tokens, H, W)."""

    embed_dim: int
    patch: int = 7
    stride: int = 4
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.embed_dim, self.patch, stride=self.stride,
                 padding=self.patch // 2, use_bias=True, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="proj")(x)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(t)
        return t, h, w


class SRAttn(nn.Module):
    """Spatial-reduction token attention (:319-380)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        heads, ch = self.num_heads, c // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(c, use_bias=self.qkv_bias, name="q", **kw)(x)
        q = q.reshape(b, n, heads, ch)
        xr = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv(c, self.sr_ratio, stride=self.sr_ratio, use_bias=True,
                      name="sr", **kw)(xr)
            xr = xr.reshape(b, -1, c)
            xr = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(xr)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, name="kv", **kw)(xr)
        kv = kv.reshape(b, -1, 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (ch ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(c, name="proj", **kw)(out.reshape(b, n, c))


class TaskQueryAttn(nn.Module):
    """Attention_dec (:382-450): fixed bank of 48 task queries,
    nearest-resized along the token axis to the kv length."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    num_queries: int = 48
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, n, c = x.shape
        heads, ch = self.num_heads, c // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        task_query = self.param("task_query", nn.initializers.normal(1.0),
                                (1, self.num_queries, c), self.param_dtype)
        tq = jnp.broadcast_to(task_query, (b, self.num_queries, c)).astype(
            x.dtype if self.dtype is None else self.dtype)
        q = nn.Dense(c, use_bias=self.qkv_bias, name="q", **kw)(tq)
        q = q.reshape(b, self.num_queries, heads, ch).transpose(0, 2, 1, 3)
        xr = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv(c, self.sr_ratio, stride=self.sr_ratio, use_bias=True,
                      name="sr", **kw)(xr)
            xr = xr.reshape(b, -1, c)
            xr = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(xr)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, name="kv", **kw)(xr)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, heads, ch)
        k, v = kv[:, :, 0].transpose(0, 2, 1, 3), kv[:, :, 1].transpose(0, 2, 1, 3)
        # nearest resize of the query bank 48 -> m (torch F.interpolate default)
        idx = (jnp.arange(m) * (self.num_queries / m)).astype(jnp.int32)
        q = q[:, :, idx, :]
        attn = jnp.einsum("bhqc,bhmc->bhqm", q, k,
                          preferred_element_type=jnp.float32) * (ch ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqm,bhmc->bhqc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)  # m == n here
        return nn.Dense(c, name="proj", **kw)(out)


class TokenMlp(nn.Module):
    """fc1 -> 3x3 dwconv (token<->image roundtrip) -> GELU -> fc2 (:258-316)."""

    hidden: int
    out: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, _ = x.shape
        x = nn.Dense(self.hidden, name="fc1", **kw)(x)
        xi = x.reshape(b, h, w, self.hidden)
        xi = Conv(self.hidden, 3, padding=1, groups=self.hidden, use_bias=True,
                  name="dwconv", **kw)(xi)
        x = gelu_exact(xi.reshape(b, n, self.hidden))
        return nn.Dense(self.out, name="fc2", **kw)(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    decoder: bool = False
    ln_eps: float = 1e-6
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn_cls = TaskQueryAttn if self.decoder else SRAttn
        rng = self.make_rng("droppath") if (train and self.drop_path_rate > 0) else None
        a = attn_cls(self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
                     name="attn", **kw)(
            WithBiasLayerNorm(eps=self.ln_eps, param_dtype=self.param_dtype,
                              name="norm1")(x), h, w)
        x = x + drop_path(a, self.drop_path_rate, rng, train)
        m = TokenMlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp", **kw)(
            WithBiasLayerNorm(eps=self.ln_eps, param_dtype=self.param_dtype,
                              name="norm2")(x), h, w)
        rng2 = jax.random.fold_in(rng, 1) if rng is not None else None
        return x + drop_path(m, self.drop_path_rate, rng2, train)


def _tokens_to_image(t, h, w):
    b, n, c = t.shape
    return t.reshape(b, h, w, c)


class Tenc(nn.Module):
    """Hierarchical encoder with intra-patch branches (:14-213, Tenc :634)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 4)
    mlp_ratios: Sequence[int] = (2, 2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    drop_path_rate: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dims = self.embed_dims
        import numpy as np

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []

        def ln(name, d):
            return WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype, name=name)

        # stage 1
        t1, h1, w1 = PatchEmbed(dims[0], 7, 4, name="patch_embed1", **kw)(x)
        x2, h2, w2 = PatchEmbed(dims[1], 3, 2, name="mini_patch_embed1", **kw)(
            _tokens_to_image(t1, h1, w1))
        cur = 0
        for i in range(self.depths[0]):
            t1 = Block(dims[0], self.num_heads[0], self.mlp_ratios[0],
                       self.sr_ratios[0], drop_path_rate=float(dpr[cur + i]),
                       name=f"block1_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("norm1", dims[0])(t1)
        img1 = _tokens_to_image(t1, h1, w1)
        x2 = Block(dims[1], self.num_heads[0], self.mlp_ratios[0],
                   self.sr_ratios[0], drop_path_rate=float(dpr[cur]),
                   name="patch_block1_0", **kw)(x2, h2, w2, train)
        x2 = ln("pnorm1", dims[1])(x2)
        mini1 = _tokens_to_image(x2, h2, w2)
        outs.append(img1)

        # stage 2
        cur += self.depths[0]
        t1, h1, w1 = PatchEmbed(dims[1], 3, 2, name="patch_embed2", **kw)(img1)
        img = _tokens_to_image(t1, h1, w1) + mini1
        x2, h2, w2 = PatchEmbed(dims[2], 3, 2, name="mini_patch_embed2", **kw)(img)
        t1 = img.reshape(img.shape[0], h1 * w1, dims[1])
        for i in range(self.depths[1]):
            t1 = Block(dims[1], self.num_heads[1], self.mlp_ratios[1],
                       self.sr_ratios[1], drop_path_rate=float(dpr[cur + i]),
                       name=f"block2_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("norm2", dims[1])(t1)
        img2 = _tokens_to_image(t1, h1, w1)
        outs.append(img2)
        x2 = Block(dims[2], self.num_heads[1], self.mlp_ratios[1],
                   self.sr_ratios[1], drop_path_rate=float(dpr[cur]),
                   name="patch_block2_0", **kw)(x2, h2, w2, train)
        x2 = ln("pnorm2", dims[2])(x2)
        mini2 = _tokens_to_image(x2, h2, w2)

        # stage 3
        cur += self.depths[1]
        t1, h1, w1 = PatchEmbed(dims[2], 3, 2, name="patch_embed3", **kw)(img2)
        img = _tokens_to_image(t1, h1, w1) + mini2
        x2, h2, w2 = PatchEmbed(dims[3], 3, 2, name="mini_patch_embed3", **kw)(img)
        t1 = img.reshape(img.shape[0], h1 * w1, dims[2])
        for i in range(self.depths[2]):
            t1 = Block(dims[2], self.num_heads[2], self.mlp_ratios[2],
                       self.sr_ratios[2], drop_path_rate=float(dpr[cur + i]),
                       name=f"block3_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("norm3", dims[2])(t1)
        img3 = _tokens_to_image(t1, h1, w1)
        outs.append(img3)
        x2 = Block(dims[3], self.num_heads[1], self.mlp_ratios[2],
                   self.sr_ratios[2], drop_path_rate=float(dpr[cur]),
                   name="patch_block3_0", **kw)(x2, h2, w2, train)
        x2 = ln("pnorm3", dims[3])(x2)
        mini3 = _tokens_to_image(x2, h2, w2)

        # stage 4 (mini_patch_embed4 exists in checkpoints but is unused)
        cur += self.depths[2]
        t1, h1, w1 = PatchEmbed(dims[3], 3, 2, name="patch_embed4", **kw)(img3)
        img = _tokens_to_image(t1, h1, w1) + mini3
        t1 = img.reshape(img.shape[0], h1 * w1, dims[3])
        for i in range(self.depths[3]):
            t1 = Block(dims[3], self.num_heads[3], self.mlp_ratios[3],
                       self.sr_ratios[3], drop_path_rate=float(dpr[cur + i]),
                       name=f"block4_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("norm4", dims[3])(t1)
        outs.append(_tokens_to_image(t1, h1, w1))
        return outs


class Tdec(nn.Module):
    """One decoder stage over the deepest encoder map (:546-647)."""

    dim: int = 512
    num_heads: int = 8
    mlp_ratio: float = 4.0
    depth: int = 3
    drop_path_rate: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        import numpy as np

        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = feats[3]
        t, h, w = PatchEmbed(self.dim, 3, 2, name="patch_embed1", **kw)(x)
        dpr = np.linspace(0, self.drop_path_rate, 16)  # sum(depths)=16 in ref
        for i in range(self.depth):
            t = Block(self.dim, self.num_heads, self.mlp_ratio, sr_ratio=1,
                      drop_path_rate=float(dpr[i]), decoder=True,
                      name=f"block1_{i}", **kw)(t, h, w, train)
        t = WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype, name="norm1")(t)
        return [_tokens_to_image(t, h, w)]


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) equivalent (base_networks.py:98):
    fractionally-strided conv, kernel stored in the importer's (k,k,O,I)
    layout and spatially flipped at call time."""

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k, s, p = self.kernel, self.stride, self.padding
        kern = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 3), out_axis=2),
            (k, k, self.features, cin), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        dt = x.dtype if self.dtype is None else self.dtype
        kern = kern[::-1, ::-1].astype(dt)
        dn = jax.lax.conv_dimension_numbers(x.shape, (k, k, cin, self.features),
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x.astype(dt), jnp.transpose(kern, (0, 1, 3, 2)), (1, 1),
            [(k - 1 - p, k - 1 - p)] * 2, lhs_dilation=(s, s),
            dimension_numbers=dn)
        return out + bias.astype(dt)


class ResidualBlock(nn.Module):
    """conv-relu-conv*0.1 + residual (base_networks.py:108-120)."""

    channels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(Conv(self.channels, 3, padding=1, use_bias=True,
                         name="conv1", **kw)(x))
        h = Conv(self.channels, 3, padding=1, use_bias=True, name="conv2", **kw)(h)
        return x + h * 0.1


def _crop_to_match(x, ref_hw):
    """The reference 'pads' with negative sizes, i.e. crops bottom/right
    (transweather_model.py:667-690)."""
    return x[:, : ref_hw[0], : ref_hw[1], :]


class ConvProjection(nn.Module):
    """Upsampling tail with dense skips (:649-712). ``dims`` mirrors the
    encoder's embed_dims (defaults = the reference's fixed 64/128/320/512);
    ``tail_dims`` are the final two upsampling widths."""

    dims: Sequence[int] = (64, 128, 320, 512)
    tail_dims: Sequence[int] = (16, 8)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc, dec):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dims
        res32 = ConvTranspose(d[3], name="convd32x", **kw)(dec[0])
        res32 = _crop_to_match(res32, enc[3].shape[1:3])
        res16 = ConvTranspose(d[2], name="convd16x", **kw)(res32 + enc[3])
        res16 = _crop_to_match(res16, enc[2].shape[1:3])
        res8 = ResidualBlock(d[2], name="dense_4_0", **kw)(res16) + enc[2]
        res8 = ConvTranspose(d[1], name="convd8x", **kw)(res8)
        res4 = ResidualBlock(d[1], name="dense_3_0", **kw)(res8) + enc[1]
        res4 = ConvTranspose(d[0], name="convd4x", **kw)(res4)
        res2 = ResidualBlock(d[0], name="dense_2_0", **kw)(res4) + enc[0]
        res2 = ConvTranspose(self.tail_dims[0], name="convd2x", **kw)(res2)
        x = ResidualBlock(self.tail_dims[0], name="dense_1_0", **kw)(res2)
        return ConvTranspose(self.tail_dims[1], name="convd1x", **kw)(x)


@register_model("transweather")
class Transweather(nn.Module):
    """:807-846. Output = tanh(conv(tail)) in [-1, 1] (the reference trains
    against GT after its own normalization; callers map to [0,1] as the
    reference eval scripts do). Size fields default to the paper config;
    smaller values give a checkpoint-incompatible but structurally identical
    net (used by CLI smoke tests)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 4)
    mlp_ratios: Sequence[int] = (2, 2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    dec_depth: int = 3
    dec_heads: int = 8
    tail_dims: Sequence[int] = (16, 8)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xc = x.astype(self.dtype) if self.dtype is not None else x
        enc = Tenc(embed_dims=tuple(self.embed_dims),
                   num_heads=tuple(self.num_heads),
                   mlp_ratios=tuple(self.mlp_ratios),
                   depths=tuple(self.depths),
                   sr_ratios=tuple(self.sr_ratios), name="Tenc", **kw)(
                       xc, train=train)
        dec = Tdec(dim=self.embed_dims[3], num_heads=self.dec_heads,
                   depth=self.dec_depth, name="Tdec", **kw)(enc, train=train)
        tail = ConvProjection(dims=tuple(self.embed_dims),
                              tail_dims=tuple(self.tail_dims),
                              name="convtail", **kw)(enc, dec)
        out = Conv(3, 3, padding=1, use_bias=True, name="clean", **kw)(tail)
        return jnp.tanh(out).astype(jnp.float32)


def transweather_key_map(key: str):
    """Drop the unused mini_patch_embed4 (defined but never called in
    forward_features) and the unused convtail conv_output."""
    if ".mini_patch_embed4." in key or key.startswith("Tenc.mini_patch_embed4"):
        return None
    if "convtail.conv_output" in key or "convproj.conv_output" in key:
        return None
    return key
