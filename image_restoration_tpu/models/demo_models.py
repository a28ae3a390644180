"""Demo / side-project models, TPU-native (NHWC, flax).

Three reference components bundled:

* ``SFSNiD`` (demo/SFSNiD.py, nighttime dehazing, CVPR'24-style): MIMO U-Net
  whose blocks mix shifted-window attention with continuous log-relative
  position bias (:23-73) over Q/K/V that are each pre-filtered by a
  frequency-spectrum SE module (``BidomainNonlinearMapping_SinglePath``
  :301-314), plus a dual-domain FFT/spatial block after every attention
  (:280-298); multi-scale inputs via instance-normed SCM stems and
  multi-scale outputs for deep supervision (:433-522).
* ``HiLo`` (demo/hilo(高低频注意力).py): attention split into windowed
  high-frequency heads and avg-pooled low-frequency heads (alpha split).
  NB the demo copy's ``hifi`` is missing its NCHW->NHWC permute (:59 is an
  identity permute), silently scrambling channels into windows; this build
  implements the intended (original LITv2) semantics — NHWC windows.
* ``PINNRestoration`` (PINN_Image_Restoration/model.py): residual CNN
  encoder/decoder with sigmoid head; its "physical constraint"
  gradient-smoothness prior lives in train/losses.py
  (``gradient_smoothness_loss``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.models.transweather import ConvTranspose
from image_restoration_tpu.ops.common import Conv, GroupedConv, gelu_exact
from image_restoration_tpu.ops.resample import resize_bilinear


# ------------------------------------------------------------------ SFSNiD --


def _log_relative_positions(ws: int) -> np.ndarray:
    """sign(d) * log(1+|d|) pair table (SFSNiD.py:23-34)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


class SELayer(nn.Module):
    """Squeeze-excite (SFSNiD.py:234-249)."""

    channel: int
    reduction: int = 16
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channel // self.reduction, use_bias=False,
                     name="fc_0", **kw)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, use_bias=False, name="fc_2", **kw)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class FreqSpectrumSE(nn.Module):
    """Frequency_Spectrum_Dynamic_Aggregation (SFSNiD.py:252-277): SE-gated
    1x1 convs on rfft magnitude and phase, residual in each domain."""

    nc: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    def _branch(self, t, name):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Conv(self.nc, 1, use_bias=True, name=f"{name}_0", **kw)(t)
        h = nn.leaky_relu(h, 0.1)
        h = SELayer(self.nc, name=f"{name}_2", **kw)(h)
        return Conv(self.nc, 1, use_bias=True, name=f"{name}_3", **kw)(h)

    @nn.compact
    def __call__(self, xf):
        mag = jnp.abs(xf).astype(jnp.float32)
        pha = jnp.angle(xf).astype(jnp.float32)
        mag = mag + self._branch(mag, "processmag")
        pha = pha + self._branch(pha, "processpha")
        return mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))


class FreqPath(nn.Module):
    """BidomainNonlinearMapping_SinglePath (SFSNiD.py:301-314)."""

    nc: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        xf = FreqSpectrumSE(self.nc, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="frequency_process")(xf)
        xs = jnp.fft.irfft2(xf, s=(h, w), axes=(1, 2)).astype(x.dtype)
        return xs + x


class BasicConv(nn.Module):
    """SFSNiD.py:321-343 (conv or transpose, optional GELU)."""

    out_channel: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True
    transpose: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.transpose:
            h = ConvTranspose(self.out_channel, self.kernel_size, self.stride,
                              self.kernel_size // 2 - 1, name="main_0", **kw)(x)
        else:
            h = Conv(self.out_channel, self.kernel_size,
                     padding=self.kernel_size // 2, stride=self.stride,
                     use_bias=True, name="main_0", **kw)(x)
        return gelu_exact(h) if self.relu else h


class ResBlockConv(nn.Module):
    """ResBlock_Conv (SFSNiD.py:210-221): conv1 -> trans -> conv2 + x."""

    nc: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = BasicConv(self.nc, 3, relu=True, name="conv1", **kw)(x)
        h = BasicConv(self.nc, 3, relu=False, name="trans_layer", **kw)(h)
        h = BasicConv(self.nc, 3, relu=False, name="conv2", **kw)(h)
        return h + x


class WindowAttentionCRPB(nn.Module):
    """Window attention with continuous relative position bias
    (SFSNiD.py:37-73)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qkv):
        # qkv: (nW*B, N, 3C)
        bw, n, _ = qkv.shape
        heads, hd = self.num_heads, self.dim // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        t = qkv.reshape(bw, n, 3, heads, hd)
        q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]  # (bw, n, heads, hd)
        rel = jnp.asarray(_log_relative_positions(self.window_size))
        bias = nn.Dense(256, name="meta_0", **kw)(rel)
        bias = nn.Dense(heads, name="meta_2", **kw)(nn.relu(bias))
        bias = bias.transpose(2, 0, 1)  # (heads, N, N)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return out.reshape(bw, n, self.dim)


class SFSAttention(nn.Module):
    """Attention (SFSNiD.py:76-174): FFT-SE-filtered Q/K/V, reflect-padded
    (optionally shifted) window attention + parallel 5x5 dwconv on V."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    conv_type: str = "DWConv"
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def vqk(name, t):
            t = FreqPath(self.dim, name=f"{name}_0", **kw)(t)
            return Conv(self.dim, 1, use_bias=True, name=f"{name}_1", **kw)(t)

        V = vqk("V", x)
        Q = vqk("Q", x)
        K = vqk("K", x)
        qkv = jnp.concatenate([Q, K, V], axis=-1)

        mph = (ws - h % ws) % ws
        mpw = (ws - w % ws) % ws
        if ss > 0:
            pt = pl = ss
            pb = (ws - ss + mph) % ws
            pr = (ws - ss + mpw) % ws
        else:
            pt = pl = 0
            pb, pr = mph, mpw
        qkv = jnp.pad(qkv, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode="reflect")
        ht, wt = qkv.shape[1:3]

        win = qkv.reshape(b, ht // ws, ws, wt // ws, ws, 3 * c)
        win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, 3 * c)
        attn_win = WindowAttentionCRPB(self.dim, ws, self.num_heads,
                                       name="attn", **kw)(win)
        out = attn_win.reshape(b, ht // ws, wt // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, ht, wt, c)
        out = out[:, pt : pt + h, pl : pl + w, :]

        if self.conv_type == "DWConv":
            # torch Conv2d(5, padding=2, padding_mode='reflect')
            vp = jnp.pad(V, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
            conv = GroupedConv(self.dim, (5, 5), padding="VALID",
                           feature_group_count=self.dim,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="conv")(vp)
            out = out + conv
        return Conv(self.dim, 1, use_bias=True, name="proj", **kw)(out)


class SFSTransformerBlock(nn.Module):
    """TransformerBlock (SFSNiD.py:177-207): LN -> attention (+res), then
    dual-domain FFT block (+res)."""

    dim: int
    num_heads: int = 2
    window_size: int = 8
    shift_size: int = 0
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="norm1")(x)
        h = SFSAttention(self.dim, self.num_heads, self.window_size,
                         self.shift_size, name="attn", **kw)(h)
        x = x + h
        # BidomainNonlinearMapping (:280-298)
        hh, ww = x.shape[1:3]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        spatial = ResBlockConv(self.dim, name="fft_block_spatial_process_block",
                               **kw)(x)
        xf = FreqSpectrumSE(self.dim, name="fft_block_frequency_process",
                            **kw)(xf)
        freq = jnp.fft.irfft2(xf, s=(hh, ww), axes=(1, 2)).astype(x.dtype)
        merged = Conv(self.dim, 1, use_bias=True, name="fft_block_cat", **kw)(
            jnp.concatenate([spatial, freq], axis=-1))
        return x + merged


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=True): per-sample spatial stats."""

    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + 1e-5)
        return (y * w + b).astype(x.dtype)


class SCM(nn.Module):
    """SCM_withFFT (SFSNiD.py:386-402)."""

    out_plane: int
    instance_norm: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = BasicConv(self.out_plane, 3, relu=True, name="main_0", **kw)(x)
        h = ResBlockConv(self.out_plane, name="main_1", **kw)(h)
        if self.instance_norm:
            h = InstanceNorm(name="ins", **kw)(h)
        return h


class ConvOut(nn.Module):
    """ConvOut_withFFT (SFSNiD.py:405-421)."""

    plane: int
    relu: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ResBlockConv(self.plane, name="main_0", **kw)(x)
        return BasicConv(3, 3, relu=self.relu, name="main_1", **kw)(h)


@register_model("sfsnid")
class SFSNiD(nn.Module):
    """SFSNiD.py:433-522 — MIMO U-Net nighttime dehazer."""

    num_res: int = 3
    base_channel: int = 32
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bc = self.base_channel
        xc = x.astype(self.dtype) if self.dtype is not None else x
        b, h, w, _ = xc.shape
        # nearest 0.5x downsamples (F.interpolate default mode)
        x2 = xc[:, ::2, ::2, :]
        x4 = x2[:, ::2, ::2, :]
        z2 = SCM(bc * 2, True, name="SCM2", **kw)(x2)
        z4 = SCM(bc * 4, True, name="SCM1", **kw)(x4)

        def eblock(t, c_, prefix):
            for i in range(self.num_res):
                t = SFSTransformerBlock(
                    c_, name=f"{prefix}_{i}_fft_transformer_block", **kw)(t)
            return t

        x_ = SCM(bc, False, name="feat_extract_0", **kw)(xc)
        res1 = eblock(x_, bc, "Encoder_0_layers")
        z = BasicConv(bc * 2, 3, stride=2, relu=True,
                      name="feat_extract_1", **kw)(res1)
        z = BasicConv(bc * 2, 3, relu=False, name="FeatureMerge2_merge", **kw)(
            jnp.concatenate([z, z2], axis=-1))
        res2 = eblock(z, bc * 2, "Encoder_1_layers")
        z = BasicConv(bc * 4, 3, stride=2, relu=True,
                      name="feat_extract_2", **kw)(res2)
        z = BasicConv(bc * 4, 3, relu=False, name="FeatureMerge1_merge", **kw)(
            jnp.concatenate([z, z4], axis=-1))
        z = eblock(z, bc * 4, "Encoder_2_layers")

        z = eblock(z, bc * 4, "Decoder_0_layers")
        out4 = ConvOut(bc * 4, name="ConvsOut_0", **kw)(z)
        z = BasicConv(bc * 2, 4, stride=2, relu=True, transpose=True,
                      name="feat_extract_3", **kw)(z)
        z = jnp.concatenate([z, res2], axis=-1)
        z = BasicConv(bc * 2, 1, relu=True, name="Convs_0", **kw)(z)
        z = eblock(z, bc * 2, "Decoder_1_layers")
        out2 = ConvOut(bc * 2, name="ConvsOut_1", **kw)(z)
        z = BasicConv(bc, 4, stride=2, relu=True, transpose=True,
                      name="feat_extract_4", **kw)(z)
        z = jnp.concatenate([z, res1], axis=-1)
        z = BasicConv(bc, 1, relu=True, name="Convs_1", **kw)(z)
        z = eblock(z, bc, "Decoder_2_layers")
        out1 = ConvOut(bc, name="feat_extract_5", **kw)(z)

        outs = [out4.astype(jnp.float32), out2.astype(jnp.float32),
                out1.astype(jnp.float32)]
        return outs if train else outs[2]


def sfsnid_key_map(key: str):
    """Flatten the torch module paths the importer can't navigate."""
    import re

    if key.endswith("relative_positions"):
        return None
    key = re.sub(r"(Encoder|Decoder)\.(\d+)\.layers\.(\d+)\.fft_transformer_block\.",
                 r"\1_\2_layers_\3_fft_transformer_block.", key)
    key = key.replace("fft_block.spatial_process.block.",
                      "fft_block_spatial_process_block.")
    key = key.replace("fft_block.frequency_process.",
                      "fft_block_frequency_process.")
    key = key.replace("fft_block.cat.", "fft_block_cat.")
    key = key.replace("FeatureMerge1.merge.", "FeatureMerge1_merge.")
    key = key.replace("FeatureMerge2.merge.", "FeatureMerge2_merge.")
    return key


# -------------------------------------------------------------------- HiLo --


@register_model("hilo")
class HiLo(nn.Module):
    """HiLo attention (demo/hilo(高低频注意力).py, intended NHWC semantics)."""

    dim: int
    num_heads: int = 8
    window_size: int = 2
    alpha: float = 0.5
    qkv_bias: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        l_heads = int(self.num_heads * self.alpha)
        h_heads = self.num_heads - l_heads
        ws = self.window_size
        if ws == 1:
            l_heads, h_heads = self.num_heads, 0
        l_dim = l_heads * head_dim
        h_dim = h_heads * head_dim
        scale = head_dim ** -0.5
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        outs = []

        if h_heads > 0:
            hg, wg = h // ws, w // ws
            xv = x.reshape(b, hg, ws, wg, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xv = xv.reshape(b, hg * wg, ws * ws, c)
            qkv = nn.Dense(h_dim * 3, use_bias=self.qkv_bias,
                           name="h_qkv", **kw)(xv)
            qkv = qkv.reshape(b, hg * wg, ws * ws, 3, h_heads, head_dim)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            attn = jnp.einsum("bgnhd,bgmhd->bghnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            o = jnp.einsum("bghnm,bgmhd->bgnhd", attn, v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
            o = o.reshape(b, hg, wg, ws, ws, h_dim)
            o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, h_dim)
            outs.append(nn.Dense(h_dim, name="h_proj", **kw)(o))

        if l_heads > 0:
            q = nn.Dense(l_dim, use_bias=self.qkv_bias, name="l_q", **kw)(x)
            q = q.reshape(b, h * w, l_heads, head_dim)
            if ws > 1:
                pooled = nn.avg_pool(x, (ws, ws), strides=(ws, ws))
                kvsrc = pooled.reshape(b, -1, c)
            else:
                kvsrc = x.reshape(b, -1, c)
            kv = nn.Dense(l_dim * 2, use_bias=self.qkv_bias,
                          name="l_kv", **kw)(kvsrc)
            kv = kv.reshape(b, -1, 2, l_heads, head_dim)
            k, v = kv[:, :, 0], kv[:, :, 1]
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
            o = o.reshape(b, h, w, l_dim)
            outs.append(nn.Dense(l_dim, name="l_proj", **kw)(o))

        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


# -------------------------------------------------------------------- PINN --


class _PinnResBlock(nn.Module):
    """PINN_Image_Restoration/model.py:10-27."""

    out_channels: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Conv(self.out_channels, 3, padding=1, use_bias=True,
                 name="conv1", **kw)(x)
        h = nn.relu(h)
        h = Conv(self.out_channels, 3, padding=1, use_bias=True,
                 name="conv2", **kw)(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, 1, use_bias=True,
                     name="downsample", **kw)(x)
        return nn.relu(h + x)


@register_model("pinn")
class PINNRestoration(nn.Module):
    """ComplexCNNModel (PINN_Image_Restoration/model.py:38-64)."""

    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(Conv(64, 3, padding=1, use_bias=True,
                         name="encoder_0", **kw)(x))
        h = _PinnResBlock(64, name="encoder_2", **kw)(h)
        h = _PinnResBlock(128, name="encoder_3", **kw)(h)
        h = nn.relu(Conv(128, 3, padding=1, use_bias=True,
                         name="encoder_4", **kw)(h))
        h = _PinnResBlock(128, name="encoder_6", **kw)(h)
        h = nn.relu(Conv(128, 3, padding=1, use_bias=True,
                         name="decoder_0", **kw)(h))
        h = _PinnResBlock(128, name="decoder_2", **kw)(h)
        h = _PinnResBlock(64, name="decoder_3", **kw)(h)
        h = Conv(3, 3, padding=1, use_bias=True, name="decoder_4", **kw)(h)
        return jax.nn.sigmoid(h).astype(jnp.float32)
