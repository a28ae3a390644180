"""GLA scan ops: chunked-parallel vs recurrent vs a naive torch oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _oracle(q, k, v, gk):
    B, H, N, Dk = q.shape
    Dv = v.shape[-1]
    scale = Dk ** -0.5
    S = torch.zeros(B, H, Dk, Dv)
    outs = []
    qt, kt, vt, gt = map(torch.from_numpy, (q, k, v, gk))
    for t in range(N):
        S = S * torch.exp(gt[:, :, t])[..., None] \
            + kt[:, :, t][..., None] * vt[:, :, t][..., None, :]
        outs.append(torch.einsum("bhk,bhkv->bhv", qt[:, :, t] * scale, S))
    return torch.stack(outs, dim=2).numpy()


@pytest.fixture
def qkvg():
    rng = np.random.default_rng(0)
    B, H, N, Dk, Dv = 2, 3, 37, 8, 16
    q = rng.standard_normal((B, H, N, Dk)).astype(np.float32)
    k = rng.standard_normal((B, H, N, Dk)).astype(np.float32)
    v = rng.standard_normal((B, H, N, Dv)).astype(np.float32)
    raw = rng.standard_normal((B, H, N, Dk)).astype(np.float32)
    gk = (np.log(1 / (1 + np.exp(-raw))) / 16).astype(np.float32)
    return q, k, v, gk


def test_recurrent_matches_oracle(qkvg):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.gla import recurrent_gla

    q, k, v, gk = qkvg
    got = np.asarray(recurrent_gla(*(jnp.asarray(t) for t in qkvg)))
    np.testing.assert_allclose(got, _oracle(q, k, v, gk), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_chunk_matches_oracle(qkvg, chunk):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.gla import chunk_gla

    q, k, v, gk = qkvg
    got = np.asarray(chunk_gla(*(jnp.asarray(t) for t in qkvg), chunk_size=chunk))
    np.testing.assert_allclose(got, _oracle(q, k, v, gk), rtol=1e-4, atol=1e-5)


def test_bidirectional_symmetry(qkvg):
    """fwd+bwd average: flipping inputs and gates flips the output."""
    import jax.numpy as jnp

    from image_restoration_tpu.ops.gla import bidirectional_gla

    q, k, v, gk = (jnp.asarray(t) for t in qkvg)
    gb = gk * 0.5
    o = bidirectional_gla(q, k, v, gk, gb)
    flip = lambda t: t[:, :, ::-1, :]
    o2 = bidirectional_gla(flip(q), flip(k), flip(v), flip(gb), flip(gk))
    np.testing.assert_allclose(np.asarray(o), np.asarray(flip(o2)),
                               rtol=1e-4, atol=1e-5)
