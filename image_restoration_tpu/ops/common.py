"""Shared conv/activation primitives (NHWC, channels-last).

All tensors are NHWC: channels ride the TPU 128-lane axis, H*W rides
sublanes, and 1x1 convs lower to plain MXU matmuls. PyTorch reference code is
NCHW; the checkpoint importer (utils/torch_import.py) transposes OIHW->HWIO.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu_exact(x):
    """erf-based GELU. torch.nn.functional.gelu default (Restormer.py:91)."""
    return jax.nn.gelu(x, approximate=False)


def simple_gate(x):
    """NAFNet SimpleGate: split channels in half, multiply.

    Reference: DarkIR-main/archs/arch_model.py:12 (class SimpleGate).
    """
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class Conv(nn.Module):
    """2D conv with torch-compatible explicit padding.

    torch ``nn.Conv2d(cin, cout, k, stride=s, padding=p, groups=g)`` maps to
    ``Conv(cout, k, stride=s, padding=p, groups=g)``. kernel is HWIO.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = [(self.padding, self.padding)] * 2
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class _ConvLeaf(nn.Module):
    """Declares Conv-compatible params (kernel HWIO, optional bias) without
    running the convolution — lets fused/folded compute paths keep the exact
    parameter tree (and checkpoint compatibility) of the unfused `Conv`."""

    features: int
    in_features: int
    kernel_size: int
    use_bias: bool
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        return kern, bias


class ConvParams(nn.Module):
    """Param-tree twin of `Conv` (nests the leaf under 'conv')."""

    features: int
    in_features: int
    kernel_size: int = 1
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return _ConvLeaf(self.features, self.in_features, self.kernel_size,
                         self.use_bias, self.param_dtype, name="conv")()


def conv2d(
    x,
    kernel,
    bias=None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
):
    """Functional NHWC conv with an HWIO kernel (for weight-bank ops like
    dynamic kernel aggregation where weights are data, not params)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def pad_to_multiple(x, multiple: int, mode: str = "reflect"):
    """Pad H and W (NHWC) up to the next multiple. Returns (padded, (H, W)).

    The reference pads with F.pad(..., 'reflect') before U-Nets
    (moce_ir.py:1054-1060 check_image_size, DarkIR.py:109-114) and crops back.
    """
    _, h, w, _ = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    return x, (h, w)


def crop_to(x, hw: Sequence[int]):
    return x[:, : hw[0], : hw[1], :]


def layer_scale_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
