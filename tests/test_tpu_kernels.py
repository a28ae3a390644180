"""Real-TPU numerics of the Pallas kernels (ADVICE r1 medium item).

The normal suite pins the virtual CPU mesh, where every fused op falls back
to its reference composition — so kernel regressions (masking, halo
indexing, accumulation) would otherwise merge silently while being the
production serving path. This file runs ONLY in a TPU session:

    IR_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -m tpu -q

Oracle: the fp32 reference composition under
``default_matmul_precision("highest")``. The bf16 kernel must stay within a
small factor of the *inherent* bf16 error (measured by running the reference
composition in bf16), not just under a loose absolute lid.
"""

import numpy as np
import pytest

tpu = pytest.mark.tpu


def _on_tpu():
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = [
    tpu,
    pytest.mark.skipif(not _on_tpu(), reason="requires a real TPU session "
                       "(IR_TPU_TESTS=1)"),
]


def _block_params(rng, c, heads, hid, ln_type, bias):
    import jax.numpy as jnp

    r = lambda *s: jnp.asarray(rng.normal(size=s).astype("float32")) * 0.1
    return (
        jnp.abs(r(c)) + 0.5,
        r(c) if ln_type != "BiasFree" else None,
        r(c, 3 * c) * 0.5,
        r(3 * c) if bias else None,
        r(3, 3, 1, 3 * c) * 0.5,
        r(3 * c) if bias else None,
        jnp.abs(r(heads, 1, 1)) + 0.5,
        r(c, c) * 0.5,
        r(c) if bias else None,
        jnp.abs(r(c)) + 0.5,
        r(c) if ln_type != "BiasFree" else None,
        r(c, 2 * hid) * 0.5,
        r(2 * hid) if bias else None,
        r(3, 3, 1, 2 * hid) * 0.5,
        r(2 * hid) if bias else None,
        r(hid, c) * 0.5,
        r(c) if bias else None,
    )


SHAPES = [
    (96, 64, 48, 1, "WithBias", False),
    (96, 64, 48, 2, "WithBias", True),
    (48, 40, 56, 1, "BiasFree", False),
    (192, 32, 32, 4, "WithBias", False),
    (384, 16, 24, 8, "WithBias", False),
]


@pytest.mark.parametrize("c,h,w,heads,ln_type,bias", SHAPES)
def test_fused_block_vs_fp32_reference(c, h, w, heads, ln_type, bias):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.kernels.block_pallas import (
        _reference_block, canvas_pad, canvas_unpad, fused_block,
    )

    rng = np.random.default_rng(0)
    hid = int(c * 2.66)
    params = _block_params(rng, c, heads, hid, ln_type, bias)
    x32 = jnp.asarray(rng.normal(size=(1, h, w, c)).astype("float32")) * 0.1
    x16 = x32.astype(jnp.bfloat16)
    cfg = (c, w, heads, ln_type, 1e-5)

    @jax.jit
    def run_fused(xx):
        return canvas_unpad(fused_block(canvas_pad(xx), params, cfg, None), w, c)

    @jax.jit
    def run_ref_bf16(xx):
        return _reference_block(xx, params, heads, ln_type, 1e-5)

    @jax.jit
    def run_ref_fp32(xx):
        with jax.default_matmul_precision("highest"):
            p32 = jax.tree.map(
                lambda t: t.astype(jnp.float32) if t is not None else None,
                params, is_leaf=lambda t: t is None)
            return _reference_block(xx, p32, heads, ln_type, 1e-5)

    oracle = np.asarray(run_ref_fp32(x32), np.float32)
    got = np.asarray(run_fused(x16), np.float32)
    base = np.asarray(run_ref_bf16(x16), np.float32)
    scale = np.abs(oracle).max() + 1e-6
    rel_fused = np.abs(got - oracle).max() / scale
    rel_bf16 = np.abs(base - oracle).max() / scale
    # the kernel may not add more than 3x the composition's own bf16 error,
    # and must stay under an absolute bf16-scale lid either way
    assert rel_fused < max(3.0 * rel_bf16, 4e-3), (
        f"fused maxrel {rel_fused:.3e} vs bf16-ref {rel_bf16:.3e}")
    assert np.isfinite(got).all()


@pytest.mark.parametrize("c,h,w,heads,ln_type,bias", SHAPES[:2])
def test_fused_block_canvas_roundtrip(c, h, w, heads, ln_type, bias):
    import jax.numpy as jnp

    from image_restoration_tpu.kernels.block_pallas import canvas_pad, canvas_unpad

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, h, w, c)).astype("float32"))
    back = canvas_unpad(canvas_pad(x), w, c)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_dwconv_taps_path_exact():
    """ops.common.Conv's TPU depthwise shift-FMA path (k<=5, stride 1) must
    match an fp64 host reference — it runs on the VPU in true fp32, unlike
    the conv op whose default-precision MXU pass rounds to bf16 (~1e-2)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.common import Conv

    rng = np.random.default_rng(0)
    for k in (3, 5):
        p = k // 2
        x = jnp.asarray(rng.standard_normal((2, 33, 29, 16)), jnp.float32)
        m = Conv(16, k, padding=p, groups=16, use_bias=True)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        kern = np.asarray(params["params"]["conv"]["kernel"], np.float64)
        bias = np.asarray(params["params"]["conv"]["bias"], np.float64)
        xp = np.pad(np.asarray(x, np.float64),
                    ((0, 0), (p, p), (p, p), (0, 0)))
        ref = np.zeros((2, 33, 29, 16))
        for dy in range(k):
            for dx in range(k):
                ref += xp[:, dy:dy + 33, dx:dx + 29, :] * kern[dy, dx, 0]
        ref += bias
        np.testing.assert_allclose(y, ref, atol=1e-5)


def test_dwconv_taps_dilated_exact():
    """_dwconv_taps with dilation (the GroupedConv depthwise fast path used
    by DRSformer's MEFC DilConvOps) must match lax.conv_general_dilated."""
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.ops.common import _dwconv_taps, _raw_gconv

    rng = np.random.default_rng(3)
    # pin fp32 conv precision: on TPU, conv_general_dilated otherwise runs
    # fp32 operands at bf16 MXU precision while the tap path is fp32 VPU FMAs
    with jax.default_matmul_precision("highest"):
        for k, dil in ((3, 2), (5, 2), (7, 2), (7, 1)):
            pad = (k - 1) * dil // 2
            x = jnp.asarray(rng.standard_normal((1, 21, 19, 8)), jnp.float32)
            kern = jnp.asarray(rng.standard_normal((k, k, 1, 8)), jnp.float32)
            got = jax.jit(_dwconv_taps, static_argnums=(2, 3))(x, kern, pad,
                                                               dil)
            ref = jax.jit(_raw_gconv, static_argnums=(2, 3, 4, 5))(
                x, kern, (1, 1), ((pad, pad), (pad, pad)), (dil, dil), 8)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
