"""Unit tests for the op library vs torch semantics."""

import numpy as np
import pytest

from conftest import nchw_to_nhwc

torch = pytest.importorskip("torch")


def test_pixel_shuffle_matches_torch(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.resample import pixel_shuffle, pixel_unshuffle

    x = rng.standard_normal((2, 8, 4, 6), dtype=np.float32)  # NCHW, C=8, r=2
    ref = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.asarray(nchw_to_nhwc(x)), 2)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=0)

    ref2 = torch.pixel_unshuffle(torch.from_numpy(ref), 2).numpy()
    got2 = pixel_unshuffle(got, 2)
    np.testing.assert_allclose(np.transpose(got2, (0, 3, 1, 2)), ref2, atol=0)


def test_layernorm_variants(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.layernorm import BiasFreeLayerNorm, WithBiasLayerNorm

    x = rng.standard_normal((2, 5, 7, 12), dtype=np.float32)
    xt = torch.from_numpy(x)

    # WithBias == proper LayerNorm over channels
    ln = WithBiasLayerNorm()
    p = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = ln.apply(p, jnp.asarray(x))
    ref = torch.nn.functional.layer_norm(xt, (12,), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)

    # BiasFree: x / sqrt(var+eps), variance still around the mean
    bln = BiasFreeLayerNorm()
    p = bln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(bln.apply(p, jnp.asarray(x)))
    var = xt.var(-1, keepdim=True, unbiased=False)
    ref = (xt / torch.sqrt(var + 1e-5)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gelu_exact(rng):
    from image_restoration_tpu.ops.common import gelu_exact
    import jax.numpy as jnp

    x = rng.standard_normal((64,), dtype=np.float32) * 3
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(gelu_exact(jnp.asarray(x))), ref,
                               rtol=1e-6, atol=1e-6)


def test_pad_to_multiple_roundtrip(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.common import crop_to, pad_to_multiple

    x = jnp.asarray(rng.standard_normal((1, 37, 51, 3), dtype=np.float32))
    p, hw = pad_to_multiple(x, 8)
    assert p.shape[1] % 8 == 0 and p.shape[2] % 8 == 0
    np.testing.assert_array_equal(np.asarray(crop_to(p, hw)), np.asarray(x))


def test_bilinear_resize_matches_torch(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.resample import resize_bilinear

    x = rng.standard_normal((2, 3, 9, 13), dtype=np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(18, 26), mode="bilinear", align_corners=False
    ).numpy()
    got = resize_bilinear(jnp.asarray(nchw_to_nhwc(x)), 18, 26)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)

    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(18, 26), mode="bilinear", align_corners=True
    ).numpy()
    got = resize_bilinear(jnp.asarray(nchw_to_nhwc(x)), 18, 26, align_corners=True)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_mesh_construction():
    import jax

    from image_restoration_tpu.core.mesh import make_mesh

    n = len(jax.devices())
    assert n == 8, "conftest should provide 8 virtual cpu devices"
    mesh = make_mesh((4, 2, 1))
    assert mesh.shape == {"data": 4, "expert": 2, "spatial": 1}


def test_normalized_channel_logits_matches_normalize_first(rng):
    """Commuted normalization == l2-normalize-then-einsum, incl. bf16 inputs.

    The fused helper contracts RAW (possibly large-magnitude) q/k with fp32
    accumulation and rescales by the channel-norm outer product; the
    reference order (Restormer.py:117-120) normalizes first. Mathematically
    identical; this pins the rounding agreement off-TPU.
    """
    import jax.numpy as jnp

    from image_restoration_tpu.ops.attention import (
        l2_normalize, normalized_channel_logits,
        normalized_channel_logits_tok_minor)

    b, n, heads, ch = 2, 64, 3, 8
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        # large magnitudes stress the raw contraction's dynamic range
        q = jnp.asarray(rng.standard_normal((b, n, heads, ch)) * 30.0, dtype)
        k = jnp.asarray(rng.standard_normal((b, n, heads, ch)) * 30.0, dtype)
        got = normalized_channel_logits(q, k)
        ref = jnp.einsum(
            "bnhc,bnhd->bhcd",
            l2_normalize(q.astype(jnp.float32), axis=1),
            l2_normalize(k.astype(jnp.float32), axis=1))
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=tol, rtol=tol)
        # token-minor variant agrees with the token-major one
        got_tm = normalized_channel_logits_tok_minor(
            jnp.moveaxis(q, 1, -1), jnp.moveaxis(k, 1, -1))
        np.testing.assert_allclose(np.asarray(got_tm), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)
