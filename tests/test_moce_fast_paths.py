"""MoCE-IR TPU fast paths: scan_blocks (nn.scan stacks) and fused_block
(whole-block canvas kernel — reference-composition fallback on CPU) must
match the plain loop layout numerically."""

import numpy as np
import pytest


def _tiny(**kw):
    from image_restoration_tpu.models.moce_ir import MoCEIR

    cfg = dict(dim=8, levels=3, heads=(2, 4, 8), num_blocks=(1, 2, 2),
               num_dec_blocks=(1, 2), num_refinement_blocks=2, rank=2,
               num_experts=4, topk=2, stage_depth=(1, 1))
    cfg.update(kw)
    return MoCEIR(**cfg)


@pytest.fixture(scope="module")
def loop_setup():
    import jax
    import jax.numpy as jnp

    model = _tiny()
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3),
                           jnp.float32, 0.2, 0.8)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    return x, params, np.asarray(ref)


def test_scan_blocks_matches_loop(loop_setup):
    from image_restoration_tpu.models.moce_ir import moce_to_scan_params

    x, params, ref = loop_setup
    model = _tiny(scan_blocks=True)
    sp = moce_to_scan_params(params, levels=3, num_blocks=(1, 2, 2),
                             num_dec_blocks=(1, 2), num_refinement_blocks=2)
    got = np.asarray(model.apply({"params": sp}, x))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_block_fallback_matches_loop(loop_setup):
    """On the CPU mesh fused_block lowers to the reference composition, so
    this validates the canvas plumbing + param twins, not TPU numerics
    (those live in test_tpu_kernels.py)."""
    x, params, ref = loop_setup
    model = _tiny(fused_block=True)
    got = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_switched_eval_matches_dense():
    """Top-1 batch-1 eval via nn.switch over the selected expert is the same
    math as the dense combine (unselected gates are exactly 0)."""
    import jax
    import jax.numpy as jnp

    switched = _tiny(topk=1)
    dense = _tiny(topk=1, switched_eval=False)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3),
                           jnp.float32, 0.2, 0.8)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    a = np.asarray(dense.apply({"params": params}, x))
    b = np.asarray(switched.apply({"params": params}, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # same param tree either way — and init through the switched path must
    # yield concrete arrays (flax's lifted switch leaks tracer params if any
    # branch runs during initialization; AdapterLayer must init dense)
    p2 = switched.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p2) == jax.tree.structure(params)
    bad = [type(l).__name__ for l in jax.tree.leaves(p2)
           if "Tracer" in type(l).__name__]
    assert not bad, f"switched init leaked tracers: {bad[:3]}"
    c = np.asarray(switched.apply({"params": p2}, x))
    assert np.isfinite(c).all()


def test_scan_blocks_trains(loop_setup):
    import jax
    import jax.numpy as jnp

    x, params, ref = loop_setup
    model = _tiny(scan_blocks=True)
    sp = model.init({"params": jax.random.PRNGKey(0),
                     "moe": jax.random.PRNGKey(1)}, x, train=True)["params"]

    def loss(p):
        out, aux = model.apply({"params": p}, x, train=True,
                               rngs={"moe": jax.random.PRNGKey(2)})
        return jnp.mean(jnp.abs(out)) + 0.01 * aux["aux_loss"]

    val, grads = jax.value_and_grad(loss)(sp)
    assert np.isfinite(float(val))
    gmax = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
