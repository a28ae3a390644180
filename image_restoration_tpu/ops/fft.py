"""Frequency-domain ops (fp32 islands, NHWC).

The zoo uses FFT branches everywhere: SRConvNet's FourierUnit on the legacy
``torch.rfft(normalized=True)`` API (m_block.py:44-69), SFHformer's grouped
complex conv, DarkIR's FreMLP on the rfft2 magnitude (arch_model.py:36-55),
AdaIR's FreModule band split, MoCE's FFTAttention. TPU rfft2 lowers fine;
what must be engineered away is per-sample Python masking (done in adair.py)
and fp16 FFts (kept fp32 here regardless of the surrounding policy).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.ops.common import Conv, gelu_exact


def rfft2(x, norm: str = "backward"):
    """NHWC rfft over (H, W) in fp32. Returns complex64 (B, H, W//2+1, C)."""
    return jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm=norm)


# --- matmul-DFT: XLA's TPU FFT lowering is ~3x slower than doing the same
# transform as MXU matmuls at the shapes these nets use (measured r2:
# rfft2+irfft2 at (1,512,512,64) = 9.4 ms vs 3.2 ms as einsums). The
# matrices are built from numpy FFTs of identity bases, so semantics match
# numpy/jnp exactly up to matmul precision.

@functools.lru_cache(maxsize=None)
def _rfft_basis(n: int):
    m = np.fft.rfft(np.eye(n), norm="ortho")            # (n, n//2+1)
    return m.real.astype(np.float32), m.imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irfft_basis(n: int):
    f = n // 2 + 1
    eye = np.eye(f)
    mr = np.fft.irfft(eye, n=n, norm="ortho")           # (f, n)
    mi = np.fft.irfft(1j * eye, n=n, norm="ortho")
    return mr.astype(np.float32), mi.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _fft_basis(n: int, inverse: bool = False):
    fn = np.fft.ifft if inverse else np.fft.fft
    m = fn(np.eye(n), norm="ortho")                     # (k, h): fn(e_k)[h]
    return m.real.astype(np.float32), m.imag.astype(np.float32)


import functools as _ft


@_ft.lru_cache(maxsize=32)
def _ct_factors(n: int, inverse: bool):
    """Cooley-Tukey 4-step factors for a length-n DFT: n = n1*n2 with n2 as
    close to the 128-lane width as possible. Returns None when no useful
    factorization exists (n prime or tiny). Bases are unnormalized except
    the ortho 1/sqrt(n) folded into the n2 stage."""
    best = None
    # prefer n2 = 128 (the MXU/VPU lane width) so the big stage runs at
    # full-width; fall back to nearby sizes
    for n2 in (128, 256, 192, 64, 96, 160):
        if n % n2 == 0 and 2 <= n // n2 <= 64:
            best = (n // n2, n2)
            break
    if best is None or n <= 128:
        return None
    n1, n2 = best
    sign = 2j if inverse else -2j
    w1 = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    tw = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    w2 = (np.exp(sign * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
          / np.sqrt(n))
    f32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return n1, n2, f32(w1), f32(tw), f32(w2)


def _cdft_4step(xr, xi, axis_len: int, inverse: bool,
                precision=jax.lax.Precision.HIGH):
    """Complex ortho DFT over axis 1 of (B, N, F, C) via the 4-step
    factorization N = n1*n2: O(N*(n1+n2)) MACs/row instead of O(N^2) —
    ~3.9x fewer FLOPs at N=512 — with the n2 stage a full-width MXU matmul.
    Returns (real, imag). Falls back to None if N doesn't factor."""
    fac = _ct_factors(axis_len, inverse)
    if fac is None:
        return None
    n1, n2, (w1r, w1i), (twr, twi), (w2r, w2i) = fac
    b, n, f, c = xr.shape
    xr = xr.reshape(b, n1, n2, f, c)
    xi = xi.reshape(b, n1, n2, f, c) if xi is not None else None
    w1r, w1i = jnp.asarray(w1r), jnp.asarray(w1i)
    # stage 1: DFT_{n1} over the major split (k n -> k)
    ar = jnp.einsum("kn,bnmfc->bkmfc", w1r, xr, precision=precision)
    ai = jnp.einsum("kn,bnmfc->bkmfc", w1i, xr, precision=precision)
    if xi is not None:
        ar = ar - jnp.einsum("kn,bnmfc->bkmfc", w1i, xi, precision=precision)
        ai = ai + jnp.einsum("kn,bnmfc->bkmfc", w1r, xi, precision=precision)
    # twiddle (k1, n2)
    twr = jnp.asarray(twr)[None, :, :, None, None]
    twi = jnp.asarray(twi)[None, :, :, None, None]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage 2: DFT_{n2} over the minor split (ortho scale folded in)
    w2r, w2i = jnp.asarray(w2r), jnp.asarray(w2i)
    zr = (jnp.einsum("bkmfc,mj->bkjfc", br, w2r, precision=precision)
          - jnp.einsum("bkmfc,mj->bkjfc", bi, w2i, precision=precision))
    zi = (jnp.einsum("bkmfc,mj->bkjfc", br, w2i, precision=precision)
          + jnp.einsum("bkmfc,mj->bkjfc", bi, w2r, precision=precision))
    # output index k = k1 + n1*k2 -> lay out (k2, k1) then flatten
    zr = zr.transpose(0, 2, 1, 3, 4).reshape(b, n, f, c)
    zi = zi.transpose(0, 2, 1, 3, 4).reshape(b, n, f, c)
    return zr, zi


# The 4-step path cuts DFT FLOPs ~3.9x but adds HBM passes (twiddle +
# reorder), and at 512^2 serving shapes the direct 2-stage einsum is already
# bandwidth-bound — measured 2.59 ms direct vs 2.73 ms 4-step for the 512^2
# x64ch roundtrip on v5e. Off by default; flip for compute-bound regimes
# (large C, small spatial).
USE_4STEP_DFT = False


def rfft2_matmul(x, precision=jax.lax.Precision.HIGH, compute_dtype=None):
    """ortho-normalized rfft2 over NHWC (H, W) as MXU einsums: direct rfft
    basis over W (Hermitian half); optional 4-step Cooley-Tukey over H
    (see USE_4STEP_DFT). Returns (real, imag), each (B, H, W//2+1, C) fp32.

    ``compute_dtype=bfloat16``: bases, operands and the stored intermediates
    run bf16 (MXU still accumulates fp32), one matmul pass instead of
    HIGH's three and half the HBM traffic. Relative error ~2^-8·sqrt(logN)
    — the same scale as the bf16 activations around it; use for serving
    paths whose module dtype is already bf16, never for metric math."""
    if compute_dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    else:
        x = x.astype(jnp.float32)
    wr, wi = map(jnp.asarray, _rfft_basis(x.shape[2]))
    wr, wi = wr.astype(x.dtype), wi.astype(x.dtype)
    ar = jnp.einsum("bhwc,wf->bhfc", x, wr, precision=precision)
    ai = jnp.einsum("bhwc,wf->bhfc", x, wi, precision=precision)
    if USE_4STEP_DFT:
        fast = _cdft_4step(ar, ai, x.shape[1], inverse=False,
                           precision=precision)
        if fast is not None:
            return fast
    hr, hi = map(jnp.asarray, _fft_basis(x.shape[1]))
    hr, hi = hr.astype(x.dtype), hi.astype(x.dtype)
    zr = (jnp.einsum("kh,bkfc->bhfc", hr, ar, precision=precision)
          - jnp.einsum("kh,bkfc->bhfc", hi, ai, precision=precision))
    zi = (jnp.einsum("kh,bkfc->bhfc", hr, ai, precision=precision)
          + jnp.einsum("kh,bkfc->bhfc", hi, ar, precision=precision))
    return zr, zi


def rfft2_fast(x, norm: str = "backward"):
    """rfft2 over NHWC (H, W) returning ``(real, imag)`` fp32 — matmul-DFT
    on TPU backends, the FFT op elsewhere. Exact norm semantics."""
    h, w = x.shape[1:3]
    if jax.default_backend() == "tpu":
        zr, zi = rfft2_matmul(x)
        if norm == "backward":
            s = float(np.sqrt(h * w))
            return zr * s, zi * s
        if norm == "forward":
            s = 1.0 / float(np.sqrt(h * w))
            return zr * s, zi * s
        return zr, zi
    z = rfft2(x, norm=norm)
    return z.real, z.imag


def irfft2_fast(zr, zi, s, norm: str = "backward", dtype=None):
    """Inverse of rfft2_fast from (real, imag); ``s=(H, W)`` output size."""
    if jax.default_backend() == "tpu":
        out = irfft2_matmul(zr, zi, s[1])
        if norm == "backward":
            out = out / float(np.sqrt(s[0] * s[1]))
        elif norm == "forward":
            out = out * float(np.sqrt(s[0] * s[1]))
        return out.astype(dtype) if dtype is not None else out
    return irfft2(zr + 1j * zi, s, norm=norm, dtype=dtype)


def irfft2_matmul(zr, zi, w_out: int, precision=jax.lax.Precision.HIGH,
                  compute_dtype=None):
    """ortho irfft2 inverse of rfft2_matmul. Returns (B, H, w_out, C) fp32
    (or bf16 under ``compute_dtype=bfloat16`` — see rfft2_matmul)."""
    if compute_dtype == jnp.bfloat16:
        zr, zi = zr.astype(jnp.bfloat16), zi.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    fast = (_cdft_4step(zr, zi, zr.shape[1], inverse=True,
                        precision=precision) if USE_4STEP_DFT else None)
    if fast is not None:
        ar, ai = fast
    else:
        hr, hi = map(jnp.asarray, _fft_basis(zr.shape[1], inverse=True))
        hr, hi = hr.astype(zr.dtype), hi.astype(zr.dtype)
        ar = (jnp.einsum("kh,bkfc->bhfc", hr, zr, precision=precision)
              - jnp.einsum("kh,bkfc->bhfc", hi, zi, precision=precision))
        ai = (jnp.einsum("kh,bkfc->bhfc", hr, zi, precision=precision)
              + jnp.einsum("kh,bkfc->bhfc", hi, zr, precision=precision))
    rr, ri = map(jnp.asarray, _irfft_basis(w_out))
    rr, ri = rr.astype(ar.dtype), ri.astype(ar.dtype)
    return (jnp.einsum("bhfc,fw->bhwc", ar, rr, precision=precision)
            + jnp.einsum("bhfc,fw->bhwc", ai, ri, precision=precision))


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
    interleaved real/imag channels -> GELU -> ortho irfft2.

    ``use_matmul_dft``: None = auto (on for TPU backends); the transform runs
    as MXU einsums (Precision.HIGH) instead of the FFT op — same math, ~3x
    faster at serving shapes (see rfft2_matmul)."""

    dim: int
    groups: int = 1
    use_matmul_dft: bool | None = None
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        matmul = self.use_matmul_dft
        if matmul is None:
            matmul = jax.default_backend() == "tpu"
        # DFT precision follows the module dtype: at bf16 serving the whole
        # unit (bases, intermediates, spectral mix) runs bf16 with fp32 MXU
        # accumulation — ~2x less HBM traffic and 3x fewer matmul passes
        # than fp32/HIGH, at the same ~2^-8 error scale as the surrounding
        # bf16 activations. dtype=None (parity/eval) keeps the fp32 DFT.
        cdt = jnp.bfloat16 if self.dtype == jnp.bfloat16 else None
        if matmul:
            zr, zi = rfft2_matmul(x, compute_dtype=cdt)
            f = jnp.stack([zr, zi], axis=-1).reshape(*zr.shape[:-1], -1)
        else:
            z = rfft2(x, norm="ortho")
            f = complex_to_channels(z)
        spec_dt = self.dtype or jnp.float32
        f = Conv(self.dim * 2, 1, groups=self.groups, use_bias=False,
                 dtype=spec_dt, param_dtype=self.param_dtype,
                 name="conv_layer")(f.astype(spec_dt))
        f = gelu_exact(f)
        if not matmul:
            f = f.astype(jnp.float32)
        if matmul:
            st = f.reshape(*f.shape[:-1], self.dim, 2)
            return irfft2_matmul(st[..., 0], st[..., 1], w,
                                 compute_dtype=cdt).astype(x.dtype)
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
        zr, zi = rfft2_fast(x, norm="backward")
        mag = jnp.sqrt(zr * zr + zi * zi)
        pha = jnp.arctan2(zi, zr)
        m = Conv(self.expand * self.nc, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="process1_0")(mag)
        m = nn.leaky_relu(m, 0.1)
        m = Conv(self.nc, 1, use_bias=True, dtype=jnp.float32,
                 param_dtype=self.param_dtype, name="process1_2")(m)
        return irfft2_fast(m * jnp.cos(pha), m * jnp.sin(pha), (h, w),
                           norm="backward", dtype=x.dtype)
