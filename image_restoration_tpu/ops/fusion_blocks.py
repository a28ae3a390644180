"""Channel/spatial fusion conv blocks (reference FCM-and-MKP.py).

``FCM`` splits channels 1/4 : 3/4, runs a small conv stack on the thin split
and a 1x1 expand on the wide split, then cross-gates them with a spatial
sigmoid map (from the wide branch) and a channel sigmoid vector (from the
thin branch), sums, and projects (FCM-and-MKP.py:69-93). Convs are
YOLO-style Conv-BN-SiLU (:17-35).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv
from image_restoration_tpu.ops.layernorm import BatchNorm2d


class ConvBNSiLU(nn.Module):
    """Conv-BN-SiLU (FCM-and-MKP.py:17-31), bias-free conv."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel, stride=self.stride,
                 padding=self.kernel // 2, use_bias=False, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv")(x)
        x = BatchNorm2d(dtype=self.dtype, param_dtype=self.param_dtype,
                        name="bn")(x, train=train)
        return jax.nn.silu(x)


class FCM(nn.Module):
    """FCM-and-MKP.py:69-93."""

    dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = self.dim // 4
        x1, x2 = x[..., :q], x[..., q:]
        x3 = ConvBNSiLU(q, 3, name="conv1", **kw)(x1, train=train)
        x3 = ConvBNSiLU(q, 3, name="conv12", **kw)(x3, train=train)
        x3 = ConvBNSiLU(self.dim, 1, name="conv123", **kw)(x3, train=train)
        x4 = ConvBNSiLU(self.dim, 1, name="conv2", **kw)(x2, train=train)
        # spatial gate from the wide branch (:55-67)
        s = Conv(1, 1, use_bias=True, name="spatial_conv1", **kw)(x4)
        s = BatchNorm2d(name="spatial_bn", **kw)(s, train=train)
        s = jax.nn.sigmoid(s)
        # channel gate from the thin branch (:37-52)
        ch = Conv(self.dim, 3, padding=1, groups=self.dim, use_bias=True,
                  name="channel_dwconv", **kw)(x3)
        ch = jax.nn.sigmoid(jnp.mean(ch, axis=(1, 2), keepdims=True))
        x5 = s * x3 + ch * x4
        return ConvBNSiLU(self.dim, 1, name="conv3", **kw)(x5, train=train)


def fcm_key_map(key: str):
    key = key.replace("spatial.conv1.", "spatial_conv1.")
    key = key.replace("spatial.bn.", "spatial_bn.")
    key = key.replace("channel.dwconv.", "channel_dwconv.")
    key = key.replace("channel.dconv.", "channel_dwconv.")
    return key
