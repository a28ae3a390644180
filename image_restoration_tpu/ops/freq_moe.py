"""Frequency-specialized 4-expert MoE layer (reference demo_test.py).

The owner's scratch design routes each image to experts specialized by
frequency band and receptive field:

* ``HighFreqLocal`` (:94-107): dwconv3 -> GELU -> dwconv3.
* ``LowFreqLocal`` (:110-124): dwconv(k) -> GELU -> 3x3 avg-pool smooth.
* ``HighFreqGlobal`` (:127-174): learnable radial high-pass gain on the rfft
  magnitude, ``(1-exp(-g f)) exp(-d f)`` clamped to [0,3].
* ``LowFreqGlobal`` (:177-224): ``exp(-d f)(1-exp(-g f))`` clamped to [0,1].
* routing (:410-522): image GAP gate + a frequency-energy gate — per-image
  radial energy histogram of |fft2| binned over the CENTERED coordinate grid
  applied to the UN-shifted spectrum (the reference's grid/spectrum
  misalignment is reproduced literally), MLP'd into expert logits; noisy
  top-k with importance/load CV^2 losses (its load loss passes the clean
  logits as the noisy ones, :454 — also reproduced).

The reference file itself cannot run (``view_as_complex`` applied to an
already-complex rfft2 output, and an eval path that tensor-indexes a
ModuleList); the parity test patches those two defects and verifies this
implementation against the remaining math. Dispatch here is dense
(static shapes), like every MoE in this framework.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.moe import (
    importance_loss,
    load_loss,
    noisy_topk_gates,
)


class HighFreqLocal(nn.Module):
    rank: int
    kernel_size: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        r = self.rank
        h = Conv(r, 3, padding=1, groups=r, use_bias=True, name="conv_0", **kw)(x)
        h = jax.nn.gelu(h, approximate=False)
        return Conv(r, 3, padding=1, groups=r, use_bias=True, name="conv_2", **kw)(h)


class LowFreqLocal(nn.Module):
    rank: int
    kernel_size: int = 7
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        h = Conv(self.rank, k, padding=k // 2, groups=self.rank, use_bias=True,
                 name="conv_0", dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.avg_pool(h, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


def _radial_freq_grid(h: int, w: int) -> np.ndarray:
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    return np.sqrt(fy**2 + fx**2).astype(np.float32)


class HighFreqGlobal(nn.Module):
    rank: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        gain = self.param("high_pass_gain",
                          nn.initializers.constant(2.0), (), self.param_dtype)
        decay = self.param("low_pass_decay",
                           nn.initializers.constant(0.5), (), self.param_dtype)
        f = jnp.asarray(_radial_freq_grid(h, w))[None, :, :, None]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        mag, pha = jnp.abs(xf), jnp.angle(xf)
        filt = jnp.clip((1 - jnp.exp(-gain * f)) * jnp.exp(-decay * f), 0, 3)
        mag = mag * filt
        out = mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))
        return jnp.fft.irfft2(out, s=(h, w), axes=(1, 2),
                              norm="ortho").astype(x.dtype)


class LowFreqGlobal(nn.Module):
    rank: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        gain = self.param("low_pass_gain",
                          nn.initializers.constant(1.0), (), self.param_dtype)
        decay = self.param("high_pass_decay",
                           nn.initializers.constant(1.0), (), self.param_dtype)
        f = jnp.asarray(_radial_freq_grid(h, w))[None, :, :, None]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        mag, pha = jnp.abs(xf), jnp.angle(xf)
        filt = jnp.clip(jnp.exp(-decay * f) * (1 - jnp.exp(-gain * f)), 0, 1)
        mag = mag * filt
        out = mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))
        return jnp.fft.irfft2(out, s=(h, w), axes=(1, 2),
                              norm="ortho").astype(x.dtype)


EXPERT_TYPES = (HighFreqLocal, HighFreqGlobal, LowFreqLocal, LowFreqGlobal)


class FreqModExpert(nn.Module):
    """ModExpert (demo_test.py:227-258) with a frequency-expert body."""

    dim: int
    rank: int
    expert_cls: Any
    kernel_size: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shared):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        h = Conv(self.rank, 1, use_bias=False, name="proj_0", **kw)(x)
        body = self.expert_cls(self.rank, name="body", **kw) \
            if self.expert_cls in (HighFreqGlobal, LowFreqGlobal) else \
            self.expert_cls(self.rank, self.kernel_size, name="body", **kw)
        h = body(h) * jax.nn.silu(Conv(self.rank, 1, use_bias=False,
                                       name="proj_1", **kw)(shared))
        h = Conv(self.dim, 1, use_bias=False, name="proj_2", **kw)(h)
        return h + shortcut


def frequency_energy(x, freq_bins: int = 8):
    """Per-image radial energy histogram (demo_test.py:473-498): |fft2|
    'forward'-normed, binned by the CENTERED integer grid norm (the grid is
    NOT fftshift-aligned with the spectrum — reproduced as written)."""
    b, h, w, c = x.shape
    mag = jnp.abs(jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2),
                               norm="forward"))
    yy = np.arange(-(h // 2), h - h // 2, dtype=np.float32)
    xx = np.arange(-(w // 2), w - w // 2, dtype=np.float32)
    dist = np.sqrt(yy[:, None] ** 2 + xx[None, :] ** 2)
    edges = np.linspace(0, dist.max(), freq_bins + 1)
    bins = []
    for i in range(freq_bins):
        mask = jnp.asarray(((dist >= edges[i]) & (dist < edges[i + 1]))
                           .astype(np.float32))[None, :, :, None]
        energy = jnp.sum(mag * mask, axis=(1, 2))  # (B, C)
        bins.append(jnp.mean(energy, axis=1))
    return jnp.stack(bins, axis=1)  # (B, freq_bins)


class FreqRoutingFunction(nn.Module):
    """demo_test.py:410-470 — image gate + frequency-energy gate."""

    dim: int
    freq_dim: int
    num_experts: int = 4
    k: int = 2
    freq_bins: int = 8
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb=None, train: bool = False):
        if freq_emb is None:
            freq_emb = frequency_energy(x, self.freq_bins)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        img_logits = nn.Dense(self.num_experts, use_bias=False,
                              dtype=jnp.float32, param_dtype=self.param_dtype,
                              name="gate_2")(pooled)
        f = nn.Dense(self.freq_dim, dtype=jnp.float32,
                     param_dtype=self.param_dtype,
                     name="freq_gate_0")(freq_emb.astype(jnp.float32))
        f = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                     param_dtype=self.param_dtype,
                     name="freq_gate_2")(nn.relu(f))
        logits = img_logits + f
        noise_std = 1.0 / self.num_experts
        aux = 0.0
        if train:
            li = importance_loss(jax.nn.softmax(logits, axis=-1))
            # the reference evaluates its load loss on (logits, logits) —
            # clean logits stand in for the noisy ones (demo_test.py:454)
            ll = load_loss(logits, logits, noise_std, self.k)
            aux = 0.5 * li + 0.5 * ll
        rng = self.make_rng("moe") if train else None
        gates, top_idx, top_vals, _ = noisy_topk_gates(logits, self.k,
                                                       noise_std, rng)
        return gates, top_idx, top_vals, aux


class FreqAdapterLayer(nn.Module):
    """New_AdapterLayer (demo_test.py:261-357), dense dispatch."""

    dim: int
    rank: int
    num_experts: int = 4
    top_k: int = 2
    stage_depth: int = 1
    rank_type: str = "constant"
    freq_dim: int = 128
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freq_emb, shared, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        kernel_sizes = [3 + 2 * i for i in range(self.num_experts)]
        if self.rank_type == "constant":
            ranks = [self.rank] * self.num_experts
        else:
            ranks = [self.dim // (2**i) for i in range(self.num_experts)][::-1]

        gates, _, _, aux = FreqRoutingFunction(
            self.dim, self.freq_dim, self.num_experts, self.top_k,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="routing")(x, freq_emb, train=train)

        out = jnp.zeros_like(x)
        for i in range(self.num_experts):
            eo = FreqModExpert(self.dim, ranks[i],
                               EXPERT_TYPES[i % len(EXPERT_TYPES)],
                               kernel_sizes[i], name=f"experts_{i}_0",
                               **kw)(x, shared)
            out = out + eo * gates[:, None, None, i : i + 1].astype(eo.dtype)
        out = Conv(self.dim, 1, use_bias=False, name="proj_out", **kw)(out)
        return out, aux
