"""The r5 HOGformer serving fast paths are exact re-associations.

* heads==1 attention skips the global HOG sort entirely: box/strided
  groupings coincide and C x C channel attention is token-permutation-
  invariant. End-to-end equivalence vs the reference's sorted computation
  is covered by test_hogformer_parity (torch sorts, we don't, outputs
  match); here the invariance claim itself is pinned directly.
* FFN_DIFF's polyphase branch-1 has two implementations (per-tap 4x4
  phase-mixing einsums vs per-output-phase full-lane taps + lane-group
  reduce, IR_HOG_FFN knob) — they must agree.
"""

import numpy as np
import pytest


@pytest.fixture()
def hf():
    from image_restoration_tpu.models import hogformer

    return hogformer


def _core(q, k, v, temp):
    """The f=1 fast-path attention core (hogformer.py attn_f1)."""
    import jax.numpy as jnp

    raw = jnp.einsum("btc,btd->bcd", q, k,
                     preferred_element_type=jnp.float32)
    qn = jnp.sqrt(jnp.einsum("btc,btc->bc", q, q,
                             preferred_element_type=jnp.float32))
    kn = jnp.sqrt(jnp.einsum("btc,btc->bc", k, k,
                             preferred_element_type=jnp.float32))
    a = raw / (jnp.maximum(qn, 1e-12)[:, :, None]
               * jnp.maximum(kn, 1e-12)[:, None, :])
    a = jnp.exp(a * temp)
    a = a / (jnp.sum(a, axis=-1, keepdims=True) + 1.0)
    return jnp.einsum("bcd,btd->btc", a.astype(v.dtype), v)


def test_channel_attention_token_permutation_invariance(rng):
    """attend(tokens[perm]) == attend(tokens)[perm] — the exact property
    that lets the 1-head block drop the reference's sort/un-sort pair
    (hogformer_arch.py:279-306 composes to identity)."""
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((2, 37, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 37, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 37, 8)).astype(np.float32))
    out = _core(q, k, v, 1.3)
    perm = np.asarray(rng.permutation(37))
    out_p = _core(q[:, perm], k[:, perm], v[:, perm], 1.3)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out)[:, perm],
                               rtol=2e-5, atol=2e-5)


def test_attention_f1_runs_and_shapes(hf, rng):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)).astype(np.float32))
    fast = hf.Attention_DHOGSA(dim=8, num_heads=1)
    params = fast.init(jax.random.PRNGKey(0), x)
    y = fast.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_ffn_stack_matches_einsum(hf, rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)).astype(np.float32))
    m = hf.FFN_DIFF(8, 3.0, True)
    params = m.init(jax.random.PRNGKey(1), x)
    monkeypatch.setattr(hf, "_FFN_MODE", "einsum")
    a = m.apply(params, x)
    monkeypatch.setattr(hf, "_FFN_MODE", "stack")
    b = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)
