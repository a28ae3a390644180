"""TPU fast-path equivalence: dwconv folding and the fused LN+GDFN kernel.

On CPU the Pallas kernel falls back to its reference composition; the
folding path runs everywhere (it is plain XLA) and must match the unfolded
modules bit-closely in fp32.
"""

import numpy as np
import pytest


def test_fold_dwconv_mdta_gdfn_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.attention import MDTA
    from image_restoration_tpu.ops.ffn import GDFN

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    m0, m1 = MDTA(8, 2), MDTA(8, 2, fold_dwconv=True)
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees (ConvParams mirrors Conv)
    assert jax.tree.structure(p) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x)["params"])
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, x)),
        np.asarray(m1.apply({"params": p}, x)), rtol=2e-5, atol=2e-5)

    g0, g1 = GDFN(8, 2.0), GDFN(8, 2.0, fold_dwconv=True)
    pg = g0.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_allclose(
        np.asarray(g0.apply({"params": pg}, x)),
        np.asarray(g1.apply({"params": pg}, x)), rtol=2e-5, atol=2e-5)


def test_restormer_fold_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import Restormer

    m0 = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                   heads=(1, 2, 4, 8))
    m1 = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                   heads=(1, 2, 4, 8), fold_dwconv=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    y0 = m0.apply({"params": p}, x)
    y1 = m1.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=5e-5, atol=5e-5)


def test_fused_ln_gdfn_cpu_fallback(rng):
    import jax.numpy as jnp

    from image_restoration_tpu.kernels.gdfn_pallas import (
        _reference_ln_gdfn,
        fused_ln_gdfn,
    )

    C = 8
    hidden = int(C * 2.0)
    mk = lambda *s, sc=0.05: jnp.asarray(
        (rng.standard_normal(s) * sc).astype(np.float32))
    params = (mk(C, sc=0.1) + 1, mk(C, sc=0.1), mk(C, 2 * hidden), None,
              mk(3, 3, 1, 2 * hidden, sc=0.1), None, mk(hidden, C), None)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    ref = _reference_ln_gdfn(x, params, "WithBias")
    got = fused_ln_gdfn(x, params, "WithBias")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # BiasFree flavor
    ref2 = _reference_ln_gdfn(x, params, "BiasFree")
    got2 = fused_ln_gdfn(x, params, "BiasFree")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-6, atol=1e-6)


def test_restormer_fused_grad_parity(rng):
    """custom_vjp backward of both fused kernels matches the unfused grads."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import Restormer

    cfg = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
               heads=(1, 2, 4, 8))
    m0 = Restormer(**cfg)
    m1 = Restormer(**cfg, fused_gdfn=True, fused_attn=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    g0 = jax.grad(lambda pp: jnp.sum(m0.apply({"params": pp}, x) ** 2))(p)
    g1 = jax.grad(lambda pp: jnp.sum(m1.apply({"params": pp}, x) ** 2))(p)
    f0 = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g0)])
    f1 = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g1)])
    rel = np.abs(f0 - f1).max() / (np.abs(f0).max() + 1e-12)
    assert rel < 1e-5, rel


def test_restormer_fused_attn_parity(rng):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import Restormer

    m0 = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                   heads=(1, 2, 4, 8))
    m1 = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                   heads=(1, 2, 4, 8), fused_gdfn=True, fused_attn=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x)["params"])
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, x)),
        np.asarray(m1.apply({"params": p}, x)), rtol=5e-5, atol=5e-5)


def test_restormer_fused_block_parity(rng):
    """fused_block canvas path: same params tree, same outputs + grads as the
    plain composition (CPU reference fallback exercises plumbing + math;
    TPU kernel numerics are checked by tools/check_fused_block.py)."""
    import jax
    import jax.numpy as jnp

    cfg = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
               heads=(1, 2, 4, 8))
    from image_restoration_tpu.models.restormer import Restormer

    m0 = Restormer(**cfg)
    m1 = Restormer(**cfg, fused_block=True)
    # non-square, non-multiple-of-16 width exercises the canvas padding
    x = jnp.asarray(rng.random((2, 32, 48, 3)).astype(np.float32))
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x)["params"])
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p}, x)),
        np.asarray(m1.apply({"params": p}, x)), rtol=5e-5, atol=5e-5)
    g0 = jax.grad(lambda pp: jnp.sum(m0.apply({"params": pp}, x) ** 2))(p)
    g1 = jax.grad(lambda pp: jnp.sum(m1.apply({"params": pp}, x) ** 2))(p)
    f0 = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g0)])
    f1 = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(g1)])
    rel = np.abs(f0 - f1).max() / (np.abs(f0).max() + 1e-12)
    assert rel < 1e-5, rel


def test_adair_fast_paths_parity(rng):
    """AdaIR inherits the Restormer serving fast paths via BlockStackMixin:
    fused_block+scan_blocks must match the plain per-block loop, and
    to_scan_params must convert AdaIR's loop param tree (FreModule params
    pass through untouched)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.adair import AdaIR
    from image_restoration_tpu.models.restormer import to_scan_params

    cfg = dict(dim=8, num_blocks=(2, 1, 1, 1), num_refinement_blocks=2,
               heads=(1, 2, 4, 8))
    m0 = AdaIR(**cfg)
    m1 = AdaIR(**cfg, fused_block=True, scan_blocks=True)
    x = jnp.asarray(rng.random((1, 32, 48, 3)).astype(np.float32))
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    pc = to_scan_params(p0, cfg["num_blocks"], cfg["num_refinement_blocks"])
    assert jax.tree.structure(pc) == jax.tree.structure(p1)
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p0}, x)),
        np.asarray(m1.apply({"params": pc}, x)), rtol=5e-5, atol=5e-5)


def test_nerd_rain_fast_paths_parity(rng):
    """NeRD-Rain stacks are Restormer TransformerBlocks run through
    BlockStackMixin; fused_block+scan_blocks must match the plain loop, with
    stack_scan_params (the generic converter) mapping the loop param tree."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.nerd_rain import MultiscaleNet
    from image_restoration_tpu.models.restormer import stack_scan_params

    cfg = dict(dim=8, num_blocks=(2, 1, 1), heads=(1, 2, 4))
    m0 = MultiscaleNet(**cfg)
    m1 = MultiscaleNet(**cfg, fused_block=True, scan_blocks=True)
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    pc = stack_scan_params(p0)
    assert jax.tree.structure(pc) == jax.tree.structure(p1)
    o0 = m0.apply({"params": p0}, x)
    o1 = m1.apply({"params": pc}, x)
    # Looser than the AdaIR test: the 3-branch pyramid chains ~3x more
    # blocks, so fp32 reassociation noise accumulates (observed max ~7e-5
    # abs on O(20)-magnitude outputs).
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-4)


def test_restormer_scan_blocks_parity(rng):
    """scan_blocks (nn.scan over each level's blocks, stacked params) must
    match the loop layout exactly; to_scan_params converts loop->scan trees
    (the path used after torch checkpoint import)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.restormer import (
        Restormer,
        to_scan_params,
    )

    cfg = dict(dim=8, num_blocks=(2, 1, 1, 1), num_refinement_blocks=2,
               heads=(1, 2, 4, 8))
    m0 = Restormer(**cfg)
    m1 = Restormer(**cfg, scan_blocks=True)
    x = jnp.asarray(rng.random((1, 32, 48, 3)).astype(np.float32))
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    pc = to_scan_params(p0, cfg["num_blocks"], cfg["num_refinement_blocks"])
    assert jax.tree.structure(pc) == jax.tree.structure(p1)
    np.testing.assert_allclose(
        np.asarray(m0.apply({"params": p0}, x)),
        np.asarray(m1.apply({"params": pc}, x)), rtol=1e-5, atol=1e-5)
