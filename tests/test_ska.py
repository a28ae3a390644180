"""SKA dynamic conv: XLA formulation vs the reference Triton semantics
(re-expressed as a torch loop), Pallas kernel (interpret mode on CPU) vs XLA,
and gradient equality."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _ska_torch_ref(x, w):
    """Direct transliteration of ska_fwd semantics (ska.py:20-48), NCHW:
    o[n,c,i,j] = sum_k x[n,c,i-p+kh,j-p+kw] * w[n, c%wc, k, i, j]."""
    n, c, h, wd = x.shape
    wc, k2 = w.shape[1], w.shape[2]
    ks = int(k2**0.5)
    pad = (ks - 1) // 2
    o = torch.zeros_like(x)
    xp = torch.nn.functional.pad(x, (pad, pad, pad, pad))
    for kh in range(ks):
        for kw in range(ks):
            xs = xp[:, :, kh : kh + h, kw : kw + wd]
            wk = w[:, :, kh * ks + kw]  # (n, wc, h, w)
            wk_full = wk.repeat_interleave(1, dim=1).repeat(1, c // wc, 1, 1)
            o += xs * wk_full
    return o


@pytest.fixture
def data(rng):
    b, h, wd, c, wc, ks = 2, 8, 10, 8, 4, 3
    x = rng.standard_normal((b, h, wd, c), dtype=np.float32)
    w = rng.standard_normal((b, h, wd, wc, ks * ks), dtype=np.float32)
    return x, w


def test_ska_xla_matches_reference_semantics(data):
    import jax.numpy as jnp

    from image_restoration_tpu.ops.ska import ska_xla

    x, w = data
    got = np.asarray(ska_xla(jnp.asarray(x), jnp.asarray(w)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(0, 3, 4, 1, 2))  # (b, wc, k2, h, w)
    ref = _ska_torch_ref(xt, wt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ska_pallas_interpret_matches_xla(data, monkeypatch):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from image_restoration_tpu.kernels import ska_pallas as kmod
    from image_restoration_tpu.ops.ska import ska_xla

    x, w = data
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, interpret=True, **k))
    got = np.asarray(kmod._ska_forward(jnp.asarray(x), jnp.asarray(w)))
    ref = np.asarray(ska_xla(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ska_custom_vjp_matches_autodiff(data):
    """The hand-written adjoint equals autodiff of the XLA formulation."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.kernels.ska_pallas import _ska_bwd
    from image_restoration_tpu.ops.ska import ska_xla

    x, w = data
    xj, wj = jnp.asarray(x), jnp.asarray(w)
    go = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape,
                                                              dtype=np.float32))
    _, vjp = jax.vjp(ska_xla, xj, wj)
    gx_ref, gw_ref = vjp(go)
    gx, gw = _ska_bwd((xj, wj), go)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-4,
                               atol=1e-5)
