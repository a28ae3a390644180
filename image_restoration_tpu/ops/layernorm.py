"""Channel LayerNorms used across the zoo, NHWC-native.

The reference reshapes NCHW -> (B, HW, C), LayerNorms the channel axis, and
reshapes back (Restormer.py:19-70). In NHWC the channel axis is already last,
so these are direct reductions over the lane axis — no data movement.

Variants:
* BiasFree  — ``x / sqrt(var(x) + eps) * w``        (Restormer.py:25-39)
* WithBias  — ``(x - mu) / sqrt(var + eps) * w + b`` (Restormer.py:41-57)
* LayerNorm2d — WithBias flavor with affine bias, used by NAFNet-lineage
  nets; the reference hand-writes its autograd (DarkIR arch_util.py:8-45),
  which JAX simply differentiates.

``var`` is the biased (unbiased=False) estimator to match torch. Statistics
are computed in fp32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BiasFreeLayerNorm(nn.Module):
    eps: float = 1e-5
    norm_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        xf = x.astype(self.norm_dtype)
        # biased variance *around the mean*, but x itself is NOT centered
        # (the "bias-free" trick: only rescale, never shift).
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = xf / jnp.sqrt(var + self.eps)
        return (y * w).astype(x.dtype)


class WithBiasLayerNorm(nn.Module):
    eps: float = 1e-5
    norm_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(self.norm_dtype)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class LayerNorm(nn.Module):
    """Dispatcher matching the reference's LayerNorm(dim, type) wrapper."""

    ln_type: str = "WithBias"  # or "BiasFree"
    eps: float = 1e-5
    norm_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cls = BiasFreeLayerNorm if self.ln_type == "BiasFree" else WithBiasLayerNorm
        return cls(
            eps=self.eps,
            norm_dtype=self.norm_dtype,
            param_dtype=self.param_dtype,
            name="body",
        )(x)


class BatchNorm2d(nn.Module):
    """torch-semantics BatchNorm over NHWC channels (SFHformer.py Block/
    FourierUnit use nn.BatchNorm2d): biased batch variance for normalization,
    unbiased for the running update, running stats stored in 'batch_stats'
    under torch's names so checkpoints import directly."""

    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = None
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
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class LayerNorm2d(nn.Module):
    """Channel LN for NAFNet-style nets (DarkIR arch_util.py:8-60), NHWC."""

    eps: float = 1e-6
    norm_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(self.norm_dtype)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)
