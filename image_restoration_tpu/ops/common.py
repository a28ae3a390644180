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


# ---------------------------------------------------------------------------
# Partition-safe grouped convolution.
#
# XLA's SPMD partitioner (both GSPMD and Shardy, JAX 0.9.0) mis-reduces the
# WEIGHT gradient of a grouped convolution when the batch is sharded over a
# proper subset of a multi-axis mesh: the batch_group_count conv that autodiff
# emits for dw gets psum'd over ALL mesh axes, scaling the grad by the size of
# every axis the batch is NOT sharded over (e.g. exactly 2x on a
# ('data','expert')=(4,2) mesh). Verified by minimal repro; dense convs and
# the dx path are unaffected. Every grouped conv in the package therefore
# routes through `grouped_conv`, a custom_vjp whose forward and dx are the
# native convs and whose dw is a tap-shift einsum (elementwise multiply +
# reduce), which the partitioner handles correctly.
# ---------------------------------------------------------------------------


def _raw_gconv(x, kernel, stride, padding, dilation, groups):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, stride, padding, rhs_dilation=dilation,
        dimension_numbers=dn, feature_group_count=groups)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv(x, kernel, stride, padding, dilation, groups):
    """NHWC/HWIO grouped conv with a partition-safe weight gradient.

    stride/dilation: 2-tuples; padding: explicit ((lo,hi),(lo,hi)).
    """
    return _raw_gconv(x, kernel, stride, padding, dilation, groups)


def _gconv_fwd(x, kernel, stride, padding, dilation, groups):
    return _raw_gconv(x, kernel, stride, padding, dilation, groups), (x, kernel)


def _gconv_bwd(stride, padding, dilation, groups, res, dy):
    x, kernel = res
    _, vjp_x = jax.vjp(
        lambda xx: _raw_gconv(xx, kernel, stride, padding, dilation, groups), x)
    (dx,) = vjp_x(dy)
    kh, kw, m, cout = kernel.shape
    q = cout // groups
    (ph0, ph1), (pw0, pw1) = padding
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    b, _, _, cin = xp.shape
    _, ho, wo, _ = dy.shape
    dyr = dy.reshape(b, ho, wo, groups, q)
    sy, sx = stride
    dly, dlx = dilation
    taps_y = []
    for ky in range(kh):
        taps_x = []
        for kx in range(kw):
            y0, x0 = ky * dly, kx * dlx
            sl = jax.lax.slice(
                xp, (0, y0, x0, 0),
                (b, y0 + (ho - 1) * sy + 1, x0 + (wo - 1) * sx + 1, cin),
                (1, sy, sx, 1))
            slr = sl.reshape(b, ho, wo, groups, m)
            taps_x.append(jnp.einsum("bhwgm,bhwgq->mgq", slr, dyr,
                                     preferred_element_type=jnp.float32))
        taps_y.append(jnp.stack(taps_x, 0))
    dw = jnp.stack(taps_y, 0).reshape(kh, kw, m, cout).astype(kernel.dtype)
    return dx, dw


grouped_conv.defvjp(_gconv_fwd, _gconv_bwd)


def _normalize_conv_padding(padding, kernel_size, stride, dilation,
                            spatial_shape=None):
    """flax/lax-style padding -> explicit ((lo,hi),(lo,hi)) pairs.

    String modes match lax exactly: SAME pads depend on the input's spatial
    shape when stride > 1, so ``spatial_shape`` (h, w) is required for them.
    """
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return ((0, 0), (0, 0))
        if padding.upper() != "SAME":
            raise ValueError(f"unsupported padding {padding!r} for grouped_conv")
        eff = tuple((k - 1) * d + 1 for k, d in zip(kernel_size, dilation))
        if spatial_shape is None:
            raise ValueError("SAME padding needs the input spatial shape")
        return tuple(jax.lax.padtype_to_pads(spatial_shape, eff, stride, "SAME"))
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    pads = []
    for p in padding:
        pads.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(pads)


class GroupedConv(nn.Module):
    """Drop-in for ``nn.Conv(feature_group_count>1)`` with the partition-safe
    gradient (see `grouped_conv`). Same param layout (kernel HWIO + bias) and
    the same `promote_dtype` semantics as flax's Conv."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Sequence[int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    kernel_init: Any = None  # defaults to nn.Conv's lecun_normal

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        stride = tuple(self.strides)
        dilation = tuple(self.kernel_dilation)
        m = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel",
                            self.kernel_init or nn.initializers.lecun_normal(),
                            (*k, m, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen import dtypes as _dtypes

        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        pads = _normalize_conv_padding(self.padding, k, stride, dilation,
                                       spatial_shape=x.shape[1:3])
        if (self.feature_group_count == x.shape[-1] == self.features
                and x.shape[-1] <= 128
                and k[0] == k[1] <= 7 and stride == (1, 1)
                and dilation[0] == dilation[1]
                and pads[0] == pads[1] and pads[0][0] == pads[0][1]
                and jax.default_backend() == "tpu"):
            # Depthwise (incl. dilated, e.g. DRSformer MEFC DilConvOps) as
            # shifted FMAs: one fused VPU pass instead of a lax grouped conv,
            # and partition-safe by construction. C <= 128 only: past one
            # lane granule XLA stops fusing the taps (3x3 over 480 ch at
            # 512^2 measured 2.98 ms unrolled vs 0.48 ms as the conv op,
            # tools/profile_qkv2.py r5).
            out = _dwconv_taps(x, kernel, pads[0][0], dilation[0])
            return out if bias is None else out + bias
        out = grouped_conv(x, kernel, stride, pads, dilation,
                           self.feature_group_count)
        if bias is not None:
            out = out + bias
        return out


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
        if (self.groups == in_ch == self.features and k <= 7
                and in_ch <= 128
                and self.stride == 1 and not isinstance(self.padding, str)
                and jax.default_backend() == "tpu"):
            # Depthwise small-k conv as k^2 shifted FMAs: XLA fuses the taps
            # into ONE pass over the tensor, measured ~1.5x faster than the
            # conv op at 512^2 serving shapes (0.68 vs 1.0 ms at k=3/C=64 on
            # v5e); also inherently partition-safe (no grouped-conv grad).
            # C <= 128 only — past one lane granule the taps stop fusing
            # (6.2x SLOWER at C=480, tools/profile_qkv2.py r5).
            from flax.linen import dtypes as _dtypes

            kern, bias = _ConvLeaf(self.features, 1, k, self.use_bias,
                                   self.param_dtype, name="conv")()
            x, kern, bias = _dtypes.promote_dtype(x, kern, bias,
                                                  dtype=self.dtype)
            out = _dwconv_taps(x, kern, self.padding)
            return out if bias is None else out + bias
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = [(self.padding, self.padding)] * 2
        if self.groups > 1:
            return GroupedConv(
                features=self.features, kernel_size=(k, k),
                strides=(self.stride, self.stride), padding=pad,
                feature_group_count=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
            )(x)
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


def _dwconv_taps(x, kern, padding: int, dilation: int = 1):
    """Depthwise conv as shifted elementwise FMAs (one fused VPU pass).
    x: (B,H,W,C); kern: (k,k,1,C); stride 1, tap offsets scaled by
    ``dilation`` (same semantics as rhs_dilation on the conv op)."""
    k = kern.shape[0]
    b, h, w, c = x.shape
    p = padding
    d = dilation
    eff = (k - 1) * d + 1
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    ho, wo = h + 2 * p - eff + 1, w + 2 * p - eff + 1
    out = None
    for dy in range(k):
        for dx in range(k):
            y0, x0 = dy * d, dx * d
            sl = jax.lax.slice(xp, (0, y0, x0, 0), (b, y0 + ho, x0 + wo, c))
            t = sl * kern[dy, dx, 0]
            out = t if out is None else out + t
    return out


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
            o = grouped_conv(xi, kij, (1, 1), tuple(pad), (1, 1), groups)
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
    dynamic kernel aggregation where weights are data, not params).

    groups > 1 routes through `grouped_conv` so the kernel gradient (weight
    banks are differentiated!) stays partition-safe."""
    pads = ((padding, padding), (padding, padding))
    if (groups == x.shape[-1] == kernel.shape[-1] and kernel.shape[2] == 1
            and x.shape[-1] <= 128
            and kernel.shape[0] == kernel.shape[1] <= 5 and stride == 1
            and jax.default_backend() == "tpu"):
        # depthwise (e.g. HOGformer's constant Sobel banks): fused VPU taps.
        # k <= 5 only: a 7x7 49-tap unroll measured SLOWER than the conv op
        # (111 vs 78 ms/img, SRConvNet MixFFN bank at 512^2 x128 on v5e)
        out = _dwconv_taps(x, kernel, padding)
    elif groups > 1:
        out = grouped_conv(x, kernel, (stride, stride), pads, (1, 1), groups)
    else:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(stride, stride), padding=pads,
            dimension_numbers=dn, feature_group_count=groups)
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
