"""Fused MEFC op-mixture steps (kernels/mefc_pallas) vs the plain Subnet.

Same evidence layers as tests/test_drs_fused_block.py: param-tree
equality, CPU-fallback equality (reference composition), interpret-mode
equality of the REAL step kernel, and custom-VJP gradient equality. TPU
numerics: tools/check_mefc.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.models.drsformer import Subnet


def _mk(c=8, h=16, w=12, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, c),
                          jnp.float32) * 0.3
    plain = Subnet(c)
    fused = Subnet(c, fused=True)
    params = plain.init(jax.random.PRNGKey(1), x)
    return x, plain, fused, params


def test_param_tree_matches():
    x, plain, fused, params = _mk()
    p2 = fused.init(jax.random.PRNGKey(1), x)
    shp = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
    assert shp(params) == shp(p2)


def test_cpu_fallback_matches_plain():
    x, plain, fused, params = _mk()
    ref = plain.apply(params, x)
    out = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_interpret_kernel_matches_plain(monkeypatch):
    from image_restoration_tpu.kernels import mefc_pallas as K

    x, plain, fused, params = _mk(h=16, w=12)
    ref = plain.apply(params, x)
    orig = K._forward
    monkeypatch.setattr(
        K, "_forward",
        lambda xx, rs, ww, interpret=False: orig(xx, rs, ww, interpret=True))
    out = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_interpret_kernel_fp32_strict(monkeypatch):
    """With the fp32 knob the kernel has NO lossy casts: interpret-mode
    output must match the reference composition to float tolerance —
    catches real index/mask bugs that loose bf16 tolerances absorb (r4:
    unmasked out-of-image SepConv t1 halo)."""
    from image_restoration_tpu.kernels import mefc_pallas as K

    x, plain, fused, params = _mk()
    ref = plain.apply(params, x)
    orig = K._forward
    monkeypatch.setattr(K, "_F32_MIX", True)
    monkeypatch.setattr(
        K, "_forward",
        lambda xx, rs, ww, interpret=False: orig(xx, rs, ww, interpret=True))
    out = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_grads_match_plain():
    x, plain, fused, params = _mk()
    g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3), g1, g2)
