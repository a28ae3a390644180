"""Frequency-domain ops (fp32 islands, NHWC).

The zoo uses FFT branches everywhere: SRConvNet's FourierUnit on the legacy
``torch.rfft(normalized=True)`` API (m_block.py:44-69), SFHformer's grouped
complex conv, DarkIR's FreMLP on the rfft2 magnitude (arch_model.py:36-55),
AdaIR's FreModule band split, MoCE's FFTAttention. TPU rfft2 lowers fine;
what must be engineered away is per-sample Python masking (done in adair.py)
and fp16 FFts (kept fp32 here regardless of the surrounding policy).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from image_restoration_tpu.ops.common import Conv, gelu_exact


def rfft2(x, norm: str = "backward"):
    """NHWC rfft over (H, W) in fp32. Returns complex64 (B, H, W//2+1, C)."""
    return jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm=norm)


def irfft2(z, s, norm: str = "backward", dtype=None):
    out = jnp.fft.irfft2(z, s=s, axes=(1, 2), norm=norm)
    return out.astype(dtype) if dtype is not None else out


def complex_to_channels(z):
    """(B,H,W,C) complex -> (B,H,W,2C) real with torch's (c, [re,im])
    interleaved channel layout (matches conv weights imported from
    m_block.py:58-63 style code)."""
    st = jnp.stack([z.real, z.imag], axis=-1)  # (B,H,W,C,2)
    b, h, w, c, _ = st.shape
    return st.reshape(b, h, w, c * 2)


def channels_to_complex(x):
    b, h, w, c2 = x.shape
    st = x.reshape(b, h, w, c2 // 2, 2)
    return st[..., 0] + 1j * st[..., 1]


class FourierUnit(nn.Module):
    """SRConvNet FourierUnit (m_block.py:44-69): ortho rfft2 -> 1x1 conv on
    interleaved real/imag channels -> GELU -> ortho irfft2."""

    dim: int
    groups: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        z = rfft2(x, norm="ortho")
        f = complex_to_channels(z)
        f = Conv(self.dim * 2, 1, groups=self.groups, use_bias=False,
                 dtype=jnp.float32, param_dtype=self.param_dtype, name="conv_layer")(f)
        f = gelu_exact(f)
        z = channels_to_complex(f)
        return irfft2(z, (h, w), norm="ortho", dtype=x.dtype)


class FreMLP(nn.Module):
    """DarkIR FreMLP (arch_model.py:36-55): MLP on the rfft2 magnitude,
    phase preserved."""

    nc: int
    expand: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        z = rfft2(x, norm="backward")
        mag = jnp.abs(z)
        pha = jnp.angle(z)
        m = Conv(self.expand * self.nc, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="process1_0")(mag)
        m = nn.leaky_relu(m, 0.1)
        m = Conv(self.nc, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="process1_2")(m)
        z = m * jnp.cos(pha) + 1j * (m * jnp.sin(pha))
        return irfft2(z, (h, w), norm="backward", dtype=x.dtype)
