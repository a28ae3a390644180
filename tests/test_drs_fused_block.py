"""Fused DRSformer whole-block kernel (kernels/drs_block_pallas).

Three layers of evidence, all CPU:
  * the fused TransformerBlock's param tree is identical to the plain one
    (torch-checkpoint import hits the same paths),
  * the CPU fallback (_reference_drs_block composition) matches the plain
    TKSA/MSFN modules,
  * the REAL pass-1/pass-2 Pallas kernels, run in interpret mode, match the
    plain composition (index math, slot layout, masks, finalize).
TPU numerics for the compiled kernels are checked on-chip by
tools/check_drs_block.py (same harness as tools/check_fused_block.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_tpu.models.drsformer import TransformerBlock


def _mk(c=8, heads=2, h=16, w=12, bias=True, ln="WithBias", expansion=2.66,
        seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (1, h, w, c),
                          jnp.float32) * 0.3
    kw = dict(dim=c, num_heads=heads, use_bias=bias, ln_type=ln,
              expansion=expansion)
    plain = TransformerBlock(**kw)
    fused = TransformerBlock(fused_block=True, **kw)
    params = plain.init(jax.random.PRNGKey(1), x)
    return x, plain, fused, params


def _shapes(tree):
    return jax.tree_util.tree_map(lambda a: a.shape, tree)


def test_fused_param_tree_matches_plain():
    from image_restoration_tpu.kernels.drs_block_pallas import (
        BORDER,
        canvas_pad,
    )

    x, plain, fused, params = _mk()
    xc = canvas_pad(x, border=BORDER)
    p2 = fused.init(jax.random.PRNGKey(1), xc, w_real=x.shape[2])
    assert _shapes(params) == _shapes(p2)


@pytest.mark.parametrize("bias,ln,expansion", [
    (True, "WithBias", 2.66),   # hidden = 21 (odd -> mixed group)
    (False, "BiasFree", 2.0),   # hidden = 16 (even)
])
def test_cpu_fallback_matches_plain(bias, ln, expansion):
    from image_restoration_tpu.kernels.drs_block_pallas import (
        BORDER,
        canvas_pad,
        canvas_unpad,
    )

    x, plain, fused, params = _mk(bias=bias, ln=ln, expansion=expansion)
    w = x.shape[2]
    ref = plain.apply(params, x)
    xc = canvas_pad(x, border=BORDER)
    out = canvas_unpad(fused.apply(params, xc, w_real=w), w, x.shape[-1],
                       border=BORDER)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("heads,bias,ln,expansion", [
    (2, True, "WithBias", 2.66),
    (1, False, "BiasFree", 2.0),
])
def test_interpret_kernels_match_plain(monkeypatch, heads, bias, ln,
                                       expansion):
    """Run the actual pass-1/pass-2 kernels (pallas interpret mode) and
    compare against the plain modules. bf16 kernel matmuls bound the
    tolerance."""
    from image_restoration_tpu.kernels import drs_block_pallas as K

    x, plain, fused, params = _mk(heads=heads, bias=bias, ln=ln,
                                  expansion=expansion)
    w, c = x.shape[2], x.shape[-1]
    ref = plain.apply(params, x)

    orig = K._forward
    monkeypatch.setattr(
        K, "_forward",
        lambda xc, p, cfg, interpret=False: orig(xc, p, cfg, interpret=True))
    xc = K.canvas_pad(x, border=K.BORDER)
    out = K.canvas_unpad(fused.apply(params, xc, w_real=w), w, c,
                         border=K.BORDER)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    # and the canvas border/pad lanes stay exactly zero
    full = fused.apply(params, xc, w_real=w)
    border = np.asarray(full).copy()
    border[:, :, K.BORDER : K.BORDER + w, :c] = 0.0
    assert np.all(border == 0.0)


def test_fused_grads_match_plain():
    """custom_vjp backward (reference recompute) == plain-path grads."""
    from image_restoration_tpu.kernels.drs_block_pallas import (
        BORDER,
        canvas_pad,
        canvas_unpad,
    )

    x, plain, fused, params = _mk()
    w, c = x.shape[2], x.shape[-1]

    def loss_plain(p):
        return jnp.sum(plain.apply(p, x) ** 2)

    def loss_fused(p):
        xc = canvas_pad(x, border=BORDER)
        out = canvas_unpad(fused.apply(p, xc, w_real=w), w, c, border=BORDER)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_plain)(params)
    g2 = jax.grad(loss_fused)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3), g1, g2)
