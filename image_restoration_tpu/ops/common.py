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
        in_ch = x.shape[-1]
        m = in_ch // max(self.groups, 1)
        q = self.features // max(self.groups, 1)
        if (self.groups >= 8 and 1 < m <= 4 and 1 <= q <= 4
                and self.stride == 1 and not isinstance(self.padding, str)
                and jax.default_backend() == "tpu"):
            # Small-group grouped convs (e.g. DarkIR DBlock's extra_conv:
            # 2-in/2-out per group, arch_model.py) are pathological on TPU —
            # neither an MXU matmul nor a depthwise pattern (one such 512^2
            # x64 call measured 60+ ms). Decompose exactly into m*q true
            # depthwise convs over strided channel slices; identical params
            # at the same 'conv' path.
            kern, bias = _ConvLeaf(self.features, m, k, self.use_bias,
                                   self.param_dtype, name="conv")()
            dt = x.dtype if self.dtype is None else self.dtype
            out = _small_group_conv(x.astype(dt), kern.astype(dt),
                                    bias if bias is None else bias.astype(dt),
                                    self.padding, self.groups)
            return out
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


def _small_group_conv(x, kern, bias, padding: int, groups: int):
    """Grouped conv with m=Cin/G in- and q=Cout/G out-channels per group as
    m*q depthwise convs: out[..., g*q+j] = sum_i dw(x[..., g*m+i],
    K[:,:,i,g*q+j]). Exact (same contraction, reassociated)."""
    kh, kw_, m, cout = kern.shape
    q = cout // groups
    pad = [(padding, padding)] * 2
    outs = []
    for j in range(q):
        acc = None
        for i in range(m):
            xi = x[..., i::m]                      # (B,H,W,G)
            kij = kern[:, :, i, j::q][:, :, None, :]  # (kh,kw,1,G)
            dn = jax.lax.conv_dimension_numbers(
                xi.shape, kij.shape, ("NHWC", "HWIO", "NHWC"))
            o = jax.lax.conv_general_dilated(
                xi, kij, (1, 1), pad, dimension_numbers=dn,
                feature_group_count=groups)
            acc = o if acc is None else acc + o
        outs.append(acc)
    out = jnp.stack(outs, axis=-1)                 # (B,H,W,G,q)
    out = out.reshape(*out.shape[:-2], cout)
    if bias is not None:
        out = out + bias
    return out


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
