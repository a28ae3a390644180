"""Matmul-DFT equivalence: the MXU-einsum rfft2/irfft2 path must match the
FFT-op path (the TPU serving fast path for FourierUnit-style branches)."""

import numpy as np
import pytest


@pytest.mark.parametrize("h,w", [(16, 16), (12, 10), (9, 15)])
def test_rfft2_matmul_matches_fft(rng, h, w):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.fft import rfft2, rfft2_matmul

    x = jnp.asarray(rng.standard_normal((2, h, w, 5), dtype=np.float32))
    z = rfft2(x, norm="ortho")
    zr, zi = rfft2_matmul(x)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(z.real),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(zi), np.asarray(z.imag),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("h,w", [(16, 16), (12, 10)])
def test_irfft2_matmul_roundtrip(rng, h, w):
    from image_restoration_tpu.ops.fft import irfft2_matmul, rfft2_matmul

    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    zr, zi = rfft2_matmul(x)
    back = irfft2_matmul(zr, zi, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=3e-5, rtol=1e-4)


def test_fourier_unit_paths_match(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.fft import FourierUnit

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8), dtype=np.float32))
    fft_unit = FourierUnit(8, use_matmul_dft=False)
    mm_unit = FourierUnit(8, use_matmul_dft=True)
    params = fft_unit.init(jax.random.PRNGKey(0), x)
    a = np.asarray(fft_unit.apply(params, x))
    b = np.asarray(mm_unit.apply(params, x))  # identical param tree
    np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)


def test_fourier_unit_grad_finite(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.fft import FourierUnit

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    unit = FourierUnit(4, use_matmul_dft=True)
    params = unit.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(unit.apply(p, x) ** 2))(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("p,hw", [(4, (12, 12)), (8, (16, 20))])
def test_fft_attention_paths_match(rng, p, hw):
    """MoCE FFTAttention: the patchified matmul-DFT path (with its
    backward-vs-ortho sqrt(N) correction) must match the FFT-op path."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.moce_ir import FFTAttention

    x = jnp.asarray(rng.standard_normal((2, *hw, 6), dtype=np.float32))
    fft_a = FFTAttention(6, patch_size=p, use_matmul_dft=False)
    mm_a = FFTAttention(6, patch_size=p, use_matmul_dft=True)
    params = fft_a.init(jax.random.PRNGKey(0), x)
    a = np.asarray(fft_a.apply(params, x))
    b = np.asarray(mm_a.apply(params, x))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
