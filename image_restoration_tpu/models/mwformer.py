"""MWFormer, TPU-native (NHWC, flax).

Re-designed from the behavior of the reference ``MWFormer/model/``:

* ``EncDec.py`` — the TransWeather skeleton (SegFormer encoder with
  intra-patch branches, task-query decoder, transposed-conv tail) where every
  feature map is conditioned on a 64-d *weather-style vector*:
  - ``FilmBlock`` (:22-64) cross-gating before each encoder patch embed;
  - hyper-ATTENTION in stage-1/patch-block-1 (:431-531): per-sample q and kv
    projection matrices generated from the vector by 2-layer hypernets;
  - hyper-MLP in every encoder block (:376-428): a per-sample per-channel
    3x3 depthwise kernel generated from the vector (batched as a single
    grouped conv with ``feature_group_count=B*C``);
  - ``Network_top`` (:906-935): Tenc + Tdec + convprojection + clean conv
    (NO tanh — :932-933 comments it out, unlike TransWeather).
* ``style_filter64.py`` — ``StyleFilter_Top`` (:371-397): a 2-stage SegFormer
  encoder, Gram matrices of both stage outputs, upper-triangular flatten,
  two MLPs, concat -> 64-d vector. Trained contrastively (main_train_style.py)
  with the vendored pytorch_metric_learning SupCon loss; here it is the same
  forward graph, trainable with optax against the supcon loss in
  train/losses.py.

Reuses the TransWeather components (models/transweather.py) for everything
unconditioned: PatchEmbed, SRAttn, TokenMlp, Block, Tdec, ConvProjection.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.models.transweather import (
    Block,
    ConvProjection,
    PatchEmbed,
    SRAttn,
    Tdec,
    TokenMlp,
    _tokens_to_image,
    drop_path,
)
from image_restoration_tpu.ops.common import Conv, conv2d, gelu_exact
from image_restoration_tpu.ops.layernorm import WithBiasLayerNorm

VEC_DIM = 64  # weather-style vector width (style_filter64.py:338)


class FilmBlock(nn.Module):
    """Cross-gating FiLM (EncDec.py:22-64): x gated by per-style weight+bias."""

    out_channels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Conv(self.out_channels, 3, padding=1, use_bias=True, name="Conv_0", **kw)(x)
        y = Conv(self.out_channels, 1, use_bias=True, name="Conv_1", **kw)(y)
        shortcut = x
        x = WithBiasLayerNorm(param_dtype=self.param_dtype, name="LayerNorm_x")(x)
        x = nn.Dense(self.out_channels, name="in_project_x", **kw)(x)
        x = gelu_exact(x)
        y = WithBiasLayerNorm(param_dtype=self.param_dtype, name="LayerNorm_y")(y)
        y = nn.Dense(self.out_channels, name="in_project_y", **kw)(y)
        y = gelu_exact(y)
        y_weight = nn.Dense(self.out_channels, name="w_project_y", **kw)(y)
        y_bias = nn.Dense(self.out_channels, name="b_project_y", **kw)(y)
        x = x * y_weight + y_bias
        x = nn.Dense(self.out_channels, name="out_project_x", **kw)(x)
        return x + shortcut


class HyperMlp(nn.Module):
    """Token MLP whose 3x3 depthwise kernel is generated per sample from the
    style vector (EncDec.py:376-428, hyper=True path)."""

    hidden: int
    out: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, vec):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, _ = x.shape
        x = nn.Dense(self.hidden, name="fc1", **kw)(x)
        # hypernet: 64 -> 3h -> 9h, reshaped (B, C, 3, 3)
        wk = nn.Dense(self.hidden * 3, name="hypernet_0", **kw)(vec)
        wk = nn.relu(wk)
        wk = nn.Dense(self.hidden * 9, name="hypernet_2", **kw)(wk)
        wk = wk.reshape(b, self.hidden, 3, 3)
        # batched per-sample depthwise conv: fold batch into channels
        # (torch: F.conv2d(x.view(1, B*C, H, W), w, groups=B*C) :421)
        xi = x.reshape(b, h, w, self.hidden)
        xr = xi.transpose(1, 2, 0, 3).reshape(1, h, w, b * self.hidden)
        kern = wk.transpose(2, 3, 0, 1).reshape(3, 3, 1, b * self.hidden)
        out = conv2d(xr, kern.astype(xr.dtype), padding=1, groups=b * self.hidden)
        xi = out.reshape(h, w, b, self.hidden).transpose(2, 0, 1, 3)
        x = gelu_exact(xi.reshape(b, n, self.hidden))
        return nn.Dense(self.out, name="fc2", **kw)(x)


class HyperSRAttn(nn.Module):
    """Spatial-reduction attention with per-sample q/kv projection matrices
    generated from the style vector (EncDec.py:431-531, hyper=True path)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, vec):
        b, n, c = x.shape
        heads, ch = self.num_heads, c // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # the reference creates static q/kv Linears that the hyper path never
        # uses (EncDec.py:442-443) — instantiate for checkpoint compat
        _ = nn.Dense(c, use_bias=self.qkv_bias, name="q", **kw)(x)

        wq = nn.Dense(VEC_DIM, name="hypernet1_0", **kw)(vec)
        wq = nn.Dense(c * c, name="hypernet1_2", **kw)(nn.relu(wq))
        wq = wq.reshape(b, c, c)  # (B, out, in)
        q = jnp.einsum("bnc,boc->bno", x, wq)
        q = q.reshape(b, n, heads, ch).transpose(0, 2, 1, 3)

        xr = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv(c, self.sr_ratio, stride=self.sr_ratio, use_bias=True,
                      name="sr", **kw)(xr)
            xr = xr.reshape(b, -1, c)
            xr = WithBiasLayerNorm(param_dtype=self.param_dtype, name="norm")(xr)
        _ = nn.Dense(2 * c, use_bias=self.qkv_bias, name="kv", **kw)(xr)

        wkv = nn.Dense(VEC_DIM, name="hypernet2_0", **kw)(vec)
        wkv = nn.Dense(2 * c * c, name="hypernet2_2", **kw)(nn.relu(wkv))
        wkv = wkv.reshape(b, 2 * c, c)
        kv = jnp.einsum("bmc,boc->bmo", xr, wkv)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, heads, ch)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k,
                          preferred_element_type=jnp.float32) * (ch ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj", **kw)(out)


class MWBlock(nn.Module):
    """Encoder block: (hyper|SR) attention + hyper MLP (EncDec.py:650-687)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    sr_ratio: int = 1
    hyper_attn: bool = False
    drop_path_rate: float = 0.0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, vec, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rng = self.make_rng("droppath") if (train and self.drop_path_rate > 0) else None
        xn = WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype,
                               name="norm1")(x)
        if self.hyper_attn:
            a = HyperSRAttn(self.dim, self.num_heads, self.sr_ratio,
                            name="attn", **kw)(xn, h, w, vec)
        else:
            a = SRAttn(self.dim, self.num_heads, self.sr_ratio,
                       name="attn", **kw)(xn, h, w)
        x = x + drop_path(a, self.drop_path_rate, rng, train)
        m = HyperMlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp", **kw)(
            WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype,
                              name="norm2")(x), h, w, vec)
        rng2 = jax.random.fold_in(rng, 1) if rng is not None else None
        return x + drop_path(m, self.drop_path_rate, rng2, train)


class MWEnc(nn.Module):
    """FiLM-conditioned hierarchical encoder (EncDec.py:66-307)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 4)
    mlp_ratios: Sequence[int] = (2, 2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    drop_path_rate: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, vec, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dims = self.embed_dims
        b, H, W, _ = x.shape
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        def ln(name):
            return WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype, name=name)

        def vec_map(hh, ww):
            return jnp.broadcast_to(vec[:, None, None, :], (b, hh, ww, VEC_DIM))

        # unused module in the reference (EncDec.py:93) — ckpt compat
        _ = WithBiasLayerNorm(param_dtype=self.param_dtype, name="layernorm")(vec)

        x = FilmBlock(dims[0], name="input_film", **kw)(x, vec_map(H, W))
        outs = []

        # stage 1
        t1, h1, w1 = PatchEmbed(dims[0], 7, 4, name="patch_embed1", **kw)(x)
        x2, h2, w2 = PatchEmbed(dims[1], 3, 2, name="mini_patch_embed1", **kw)(
            _tokens_to_image(t1, h1, w1))
        cur = 0
        for i in range(self.depths[0]):
            t1 = MWBlock(dims[0], self.num_heads[0], self.mlp_ratios[0],
                         self.sr_ratios[0], hyper_attn=True,
                         drop_path_rate=float(dpr[cur + i]),
                         name=f"block1_{i}", **kw)(t1, h1, w1, vec, train)
        t1 = ln("norm1")(t1)
        img1 = _tokens_to_image(t1, h1, w1)
        x2 = MWBlock(dims[1], self.num_heads[0], self.mlp_ratios[0],
                     self.sr_ratios[0], hyper_attn=True,
                     drop_path_rate=float(dpr[cur]),
                     name="patch_block1_0", **kw)(x2, h2, w2, vec, train)
        x2 = ln("pnorm1")(x2)
        mini1 = _tokens_to_image(x2, h2, w2)
        outs.append(img1)

        # stage 2
        cur += self.depths[0]
        img1 = FilmBlock(dims[0], name="film1", **kw)(img1, vec_map(h1, w1))
        t1, h1, w1 = PatchEmbed(dims[1], 3, 2, name="patch_embed2", **kw)(img1)
        img = _tokens_to_image(t1, h1, w1) + mini1
        x2, h2, w2 = PatchEmbed(dims[2], 3, 2, name="mini_patch_embed2", **kw)(img)
        t1 = img.reshape(b, h1 * w1, dims[1])
        for i in range(self.depths[1]):
            t1 = MWBlock(dims[1], self.num_heads[1], self.mlp_ratios[1],
                         self.sr_ratios[1], drop_path_rate=float(dpr[cur + i]),
                         name=f"block2_{i}", **kw)(t1, h1, w1, vec, train)
        t1 = ln("norm2")(t1)
        img2 = _tokens_to_image(t1, h1, w1)
        outs.append(img2)
        x2 = MWBlock(dims[2], self.num_heads[1], self.mlp_ratios[1],
                     self.sr_ratios[1], drop_path_rate=float(dpr[cur]),
                     name="patch_block2_0", **kw)(x2, h2, w2, vec, train)
        x2 = ln("pnorm2")(x2)
        mini2 = _tokens_to_image(x2, h2, w2)

        # stage 3
        cur += self.depths[1]
        img2 = FilmBlock(dims[1], name="film2", **kw)(img2, vec_map(h1, w1))
        t1, h1, w1 = PatchEmbed(dims[2], 3, 2, name="patch_embed3", **kw)(img2)
        img = _tokens_to_image(t1, h1, w1) + mini2
        x2, h2, w2 = PatchEmbed(dims[3], 3, 2, name="mini_patch_embed3", **kw)(img)
        t1 = img.reshape(b, h1 * w1, dims[2])
        for i in range(self.depths[2]):
            t1 = MWBlock(dims[2], self.num_heads[2], self.mlp_ratios[2],
                         self.sr_ratios[2], drop_path_rate=float(dpr[cur + i]),
                         name=f"block3_{i}", **kw)(t1, h1, w1, vec, train)
        t1 = ln("norm3")(t1)
        img3 = _tokens_to_image(t1, h1, w1)
        outs.append(img3)
        x2 = MWBlock(dims[3], self.num_heads[1], self.mlp_ratios[2],
                     self.sr_ratios[2], drop_path_rate=float(dpr[cur]),
                     name="patch_block3_0", **kw)(x2, h2, w2, vec, train)
        x2 = ln("pnorm3")(x2)
        mini3 = _tokens_to_image(x2, h2, w2)

        # stage 4 (mini_patch_embed4 exists in checkpoints but is unused)
        cur += self.depths[2]
        img3 = FilmBlock(dims[2], name="film3", **kw)(img3, vec_map(h1, w1))
        t1, h1, w1 = PatchEmbed(dims[3], 3, 2, name="patch_embed4", **kw)(img3)
        img = _tokens_to_image(t1, h1, w1) + mini3
        t1 = img.reshape(b, h1 * w1, dims[3])
        for i in range(self.depths[3]):
            t1 = MWBlock(dims[3], self.num_heads[3], self.mlp_ratios[3],
                         self.sr_ratios[3], drop_path_rate=float(dpr[cur + i]),
                         name=f"block4_{i}", **kw)(t1, h1, w1, vec, train)
        t1 = ln("norm4")(t1)
        outs.append(_tokens_to_image(t1, h1, w1))
        return outs


@register_model("mwformer_backbone")
class MWFormerBackbone(nn.Module):
    """Network_top (EncDec.py:906-935): restoration backbone conditioned on a
    precomputed 64-d style vector. No tanh on the output (:932-933). Size
    fields default to the paper config."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 4)
    mlp_ratios: Sequence[int] = (2, 2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    dec_depth: int = 3
    dec_heads: int = 8
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feature_vec, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xc = x.astype(self.dtype) if self.dtype is not None else x
        enc = MWEnc(embed_dims=tuple(self.embed_dims),
                    num_heads=tuple(self.num_heads),
                    mlp_ratios=tuple(self.mlp_ratios),
                    depths=tuple(self.depths),
                    sr_ratios=tuple(self.sr_ratios), name="Tenc", **kw)(
                        xc, feature_vec, train=train)
        dec = Tdec(dim=self.embed_dims[3], num_heads=self.dec_heads,
                   depth=self.dec_depth, name="Tdec", **kw)(enc, train=train)
        tail = ConvProjection(dims=tuple(self.embed_dims),
                              name="convtail", **kw)(enc, dec)
        out = Conv(3, 3, padding=1, use_bias=True, name="clean", **kw)(tail)
        return out.astype(jnp.float32)


def gram_upper_vec(feat):
    """Gram matrix of NHWC features, upper-triangular (incl. diagonal)
    flattened row-major (style_filter64.py:350-392)."""
    b, h, w, c = feat.shape
    t = feat.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bnd->bcd", t, t)
    iu = jnp.triu_indices(c)
    return gram[:, iu[0], iu[1]]


@register_model("mwformer_style")
class StyleFilter(nn.Module):
    """StyleFilter_Top (style_filter64.py:371-397): 2-stage encoder -> Gram
    vectors -> MLPs -> 64-d weather-style vector."""

    embed_dims: Sequence[int] = (64, 128)
    num_heads: Sequence[int] = (1, 2)
    mlp_ratios: Sequence[int] = (2, 2)
    depths: Sequence[int] = (2, 2)
    sr_ratios: Sequence[int] = (4, 2)
    drop_path_rate: float = 0.1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dims = self.embed_dims
        b = x.shape[0]
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        def ln(name):
            return WithBiasLayerNorm(eps=1e-6, param_dtype=self.param_dtype,
                                     name=name)

        # stage 1 (style_filter64.py:93-111)
        t1, h1, w1 = PatchEmbed(dims[0], 7, 4, name="encoder_patch_embed1",
                                **kw)(x)
        x2, h2, w2 = PatchEmbed(dims[1], 3, 2, name="encoder_mini_patch_embed1",
                                **kw)(_tokens_to_image(t1, h1, w1))
        for i in range(self.depths[0]):
            t1 = Block(dims[0], self.num_heads[0], self.mlp_ratios[0],
                       self.sr_ratios[0], drop_path_rate=float(dpr[i]),
                       name=f"encoder_block1_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("encoder_norm1")(t1)
        img1 = _tokens_to_image(t1, h1, w1)
        x2 = Block(dims[1], self.num_heads[0], self.mlp_ratios[0],
                   self.sr_ratios[0], drop_path_rate=float(dpr[0]),
                   name="encoder_patch_block1_0", **kw)(x2, h2, w2, train)
        x2 = ln("encoder_pnorm1")(x2)
        mini1 = _tokens_to_image(x2, h2, w2)

        # stage 2 (:113-123)
        t1, h1, w1 = PatchEmbed(dims[1], 3, 2, name="encoder_patch_embed2",
                                **kw)(img1)
        img = _tokens_to_image(t1, h1, w1) + mini1
        t1 = img.reshape(b, h1 * w1, dims[1])
        for i in range(self.depths[1]):
            t1 = Block(dims[1], self.num_heads[1], self.mlp_ratios[1],
                       self.sr_ratios[1],
                       drop_path_rate=float(dpr[self.depths[0] + i]),
                       name=f"encoder_block2_{i}", **kw)(t1, h1, w1, train)
        t1 = ln("encoder_norm2")(t1)
        img2 = _tokens_to_image(t1, h1, w1)

        # gram vectors + MLP heads (:382-396)
        g1 = gram_upper_vec(img1)
        g2 = gram_upper_vec(img2)
        f1 = nn.Dense(g1.shape[-1] // 2, name="style_filter1_hidden", **kw)(g1)
        f1 = nn.leaky_relu(f1)
        f1 = nn.Dense(g1.shape[-1] // 4, name="style_filter1_hidden2", **kw)(f1)
        f1 = nn.leaky_relu(f1)
        f1 = nn.Dense(VEC_DIM, name="style_filter1_output", **kw)(f1)
        f2 = nn.Dense(g2.shape[-1] // 8, name="style_filter2_hidden", **kw)(g2)
        f2 = nn.leaky_relu(f2)
        f2 = nn.Dense(VEC_DIM, name="style_filter2_output", **kw)(f2)
        out = nn.Dense(VEC_DIM, name="out1_fc", **kw)(
            jnp.concatenate([f1, f2], axis=-1))
        # unused layernorm (:380, :396 returns pre-norm) — ckpt compat
        _ = WithBiasLayerNorm(param_dtype=self.param_dtype, name="layernorm")(out)
        return out


@register_model("mwformer")
class MWFormer(nn.Module):
    """Style filter + backbone end-to-end (the composition MWFormer/test.py
    runs: vec = StyleFilter(x); out = Network_top(x, vec)). The two-stage
    training driver (MWFormer/main_train_style.py then train.py) maps to
    cli/train.py: stage 1 trains ``mwformer_style`` with the SupCon recipe,
    stage 2 trains this model with --style_ckpt + --freeze style_filter."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 4, 4)
    mlp_ratios: Sequence[int] = (2, 2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 2)
    sr_ratios: Sequence[int] = (4, 2, 2, 1)
    dec_depth: int = 3
    dec_heads: int = 8
    style_embed_dims: Sequence[int] = (64, 128)
    style_depths: Sequence[int] = (2, 2)
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        vec = StyleFilter(embed_dims=tuple(self.style_embed_dims),
                          depths=tuple(self.style_depths),
                          name="style_filter", **kw)(x, train=train)
        return MWFormerBackbone(
            embed_dims=tuple(self.embed_dims), num_heads=tuple(self.num_heads),
            mlp_ratios=tuple(self.mlp_ratios), depths=tuple(self.depths),
            sr_ratios=tuple(self.sr_ratios), dec_depth=self.dec_depth,
            dec_heads=self.dec_heads, name="backbone", **kw)(
                x, vec, train=train)


def mwformer_key_map(key: str):
    """Drop unused torch modules and flatten the style filter's naming."""
    if ".mini_patch_embed4." in key:
        return None
    if "convtail.conv_output" in key:
        return None
    return key


def style_filter_key_map(key: str):
    """torch ``encoder.block1.0...`` -> flax ``encoder_block1_0...``;
    ``style_filter1.hidden`` -> ``style_filter1_hidden``."""
    key = key.replace("encoder.", "encoder_")
    key = key.replace("style_filter1.", "style_filter1_")
    key = key.replace("style_filter2.", "style_filter2_")
    return key
