"""FID — Frechet Inception Distance (basicsr protocol).

Port of `HOGformer-main/settingI/basicsr/metrics/fid.py` (calculate_fid
:57-102, extract_inception_features :22-55, feature-stat conventions).

A faithful note on the feature extractor: the reference's
`load_patched_inception_v3` imports `basicsr.models.archs.inception`, a
module that does NOT exist in the reference copy (its `archs/` holds only
`hogformer_arch.py`), and no config or script calls the FID path — the file
is dead code as shipped. We therefore implement the *working* surface — the
Frechet distance, the streamed feature extraction loop, and the stat
helpers — against a pluggable `feature_fn`, and provide the repo's VGG16
trunk (eval/perceptual.py) as the default extractor when its imported torch
weights are available. Any extractor with a `(B, H, W, 3) -> (B, D)`
signature works, including an InceptionV3 port with pretrained weights.
"""

from __future__ import annotations

import numpy as np


def compute_feature_stats(features) -> tuple[np.ndarray, np.ndarray]:
    """Sample mean and covariance of an (N, D) feature matrix.

    Matches the basicsr convention (np.cov with rowvar=False, i.e. the
    unbiased N-1 estimator) used to build the (mu, sigma) pairs fed to
    `calculate_fid`.
    """
    feats = np.asarray(features, dtype=np.float64)
    if feats.ndim != 2:
        feats = feats.reshape(feats.shape[0], -1)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def extract_features(data_generator, feature_fn, len_generator=None):
    """Streamed feature extraction (fid.py:22-55 without the CUDA plumbing).

    Args:
        data_generator: yields (B, H, W, 3) image batches (any array type
            convertible by feature_fn).
        feature_fn: callable mapping a batch to (B, D) features — e.g. a
            jitted flax apply.
        len_generator: unused except for API parity (the reference only uses
            it for a progress bar).

    Returns:
        (N, D) numpy feature matrix.
    """
    del len_generator
    chunks = []
    for batch in data_generator:
        feats = np.asarray(feature_fn(batch))
        chunks.append(feats.reshape(feats.shape[0], -1))
    return np.concatenate(chunks, axis=0)


def calculate_fid(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between N(mu1, sigma1) and N(mu2, sigma2).

    d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)); the stable
    Sutherland formulation including the singular-product eps retry and the
    imaginary-component tolerance check (fid.py:57-102).
    """
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))
    assert mu1.shape == mu2.shape, 'Two mean vectors have different lengths'
    assert sigma1.shape == sigma2.shape, (
        'Two covariances have different dimensions')

    def _sqrtm(mat):
        # scipy < 1.14 returns (sqrtm, errest) with disp=False; newer scipy
        # dropped the tuple return.
        try:
            out = linalg.sqrtm(mat, disp=False)
        except TypeError:
            out = linalg.sqrtm(mat)
        return out[0] if isinstance(out, tuple) else out

    cov_sqrt = _sqrtm(sigma1 @ sigma2)

    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = _sqrtm((sigma1 + offset) @ (sigma2 + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f'Imaginary component {m}')
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    return float(mean_norm + trace)


def fid_from_features(feats1, feats2, eps: float = 1e-6) -> float:
    """FID between two raw feature sets (each (N, D))."""
    mu1, s1 = compute_feature_stats(feats1)
    mu2, s2 = compute_feature_stats(feats2)
    return calculate_fid(mu1, s1, mu2, s2, eps=eps)
