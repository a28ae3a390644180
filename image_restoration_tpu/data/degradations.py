"""Degradation synthesis.

The reference adds Gaussian noise on the host per sample
(degradation_utils.py:21-24: uint8 pixels + N(0, sigma), clip, re-quantize).
TPU-first, the noise is synthesized ON DEVICE over the whole batch with the
JAX PRNG (one fused kernel, reproducible, no host RNG in the input path);
an exact-uint8-semantics numpy variant is kept for protocol parity tests
and for test-time noise (IRBenchmarks._add_gaussian_noise :408-411).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# de_type index convention (MoCE options: denoise_15/25/50 first)
SIGMA_BY_DE_ID = {0: 15.0, 1: 25.0, 2: 50.0}


def add_gaussian_noise_np(clean_uint8: np.ndarray, sigma: float,
                          rng: np.random.Generator | None = None):
    """Reference-exact host path: clip(img + N(0,1)*sigma) on 0-255 uint8."""
    rng = rng or np.random.default_rng()
    noise = rng.standard_normal(clean_uint8.shape)
    noisy = np.clip(clean_uint8.astype(np.float64) + noise * sigma, 0, 255)
    return noisy.astype(np.uint8)


def add_gaussian_noise(key, clean01, sigma):
    """On-device batch noise on [0,1] floats; sigma scalar or (B,)-vector
    (sigma in 0-255 units, matching the reference's pixel-scale sigma)."""
    sigma = jnp.asarray(sigma, clean01.dtype)
    if sigma.ndim == 1:
        sigma = sigma.reshape(-1, *([1] * (clean01.ndim - 1)))
    noise = jax.random.normal(key, clean01.shape, clean01.dtype)
    return jnp.clip(clean01 + noise * sigma / 255.0, 0.0, 1.0)


def mixup_device(key, lq, gt, beta: float = 1.2, use_identity: bool = False):
    """On-device batch mixup (BasicSR Mixing_Augment,
    image_restoration_model.py:145-170): one shared lam ~ Beta(beta, beta)
    and one shared permutation mix BOTH lq and gt; with ``use_identity`` the
    mix is skipped with probability 1/(n_augments+1) = 1/2.

    Runs after degradation synthesis, matching the reference order (the
    dataset yields already-degraded lq; feed_train_data mixes it :276-284).
    """
    k_lam, k_perm, k_id = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, beta, beta, dtype=jnp.float32)
    perm = jax.random.permutation(k_perm, lq.shape[0])
    if use_identity:
        lam = jnp.where(jax.random.bernoulli(k_id, 0.5), lam, 1.0)
    lam = lam.astype(lq.dtype)
    return (lam * lq + (1 - lam) * lq[perm],
            lam * gt + (1 - lam) * gt[perm])


def degrade_batch(key, batch):
    """Apply per-sample synthetic degradations on device.

    batch: dict with 'gt' (B,H,W,C in [0,1]) and 'sigma' (B,) where sigma==0
    means the lq was loaded from disk (non-synthetic task) and is passed
    through unchanged.
    """
    if "sigma" not in batch:
        return batch
    sigma = batch["sigma"]
    noisy = add_gaussian_noise(key, batch["gt"], sigma)
    lq = jnp.where((sigma > 0).reshape(-1, 1, 1, 1), noisy, batch["lq"])
    out = dict(batch)
    out["lq"] = lq
    return out
