"""Software-pipelined fused-block path (IR_TPU_PIPE): the chunked
matmul->tap pipe in BOTH pass kernels must be numerically identical to the
serial kernel structure, and match the plain reference block.

Runs the REAL Pallas kernels in interpret mode on CPU (block_pallas's
_INTERPRET hook), with the pipe chunk count forced via the module global
(the env var is captured at import; tests poke the global directly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_restoration_tpu.kernels import block_pallas as K


def _mk_params(rng, c, hidden, heads, bias):
    def mk(*shape, sc=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * sc)

    b = (lambda *s: mk(*s, sc=0.01)) if bias else (lambda *s: None)
    return (
        mk(c) + 1.0, b(c),                       # ln1
        mk(c, 1, 1, 3 * c), b(3 * c),            # qkv 1x1 (HWIO)
        mk(3, 3, 1, 3 * c), b(3 * c),            # qkv dwconv
        mk(heads, 1, 1) + 1.0,                   # temperature
        mk(c, 1, 1, c), b(c),                    # proj
        mk(c) + 1.0, b(c),                       # ln2
        mk(c, 1, 1, 2 * hidden), b(2 * hidden),  # GDFN in
        mk(3, 3, 1, 2 * hidden), b(2 * hidden),  # GDFN dw
        mk(hidden, 1, 1, c), b(c),               # GDFN out
    )


@pytest.mark.parametrize("heads,bias,pipe", [(2, True, 4), (1, False, 3)])
def test_pipelined_block_matches_serial_and_reference(monkeypatch, heads,
                                                      bias, pipe):
    rng = np.random.default_rng(0)
    c, hidden, h, w = 48, 96, 24, 20
    params = _mk_params(rng, c, hidden, heads, bias)
    cfg = (c, w, heads, "WithBias" if bias else "BiasFree", 1e-6)
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    xc = K.canvas_pad(x)

    ref = K._reference_block(x, params, heads, cfg[3], 1e-6)

    monkeypatch.setattr(K, "_INTERPRET", True)
    monkeypatch.setattr(K, "_PIPE", 0)
    serial = K.canvas_unpad(K._forward(xc, params, cfg), w, c)
    monkeypatch.setattr(K, "_PIPE", pipe)
    piped = K.canvas_unpad(K._forward(xc, params, cfg), w, c)

    # pipe restructure is exact (same ops, same order per chunk)
    np.testing.assert_allclose(np.asarray(piped, np.float32),
                               np.asarray(serial, np.float32),
                               rtol=0, atol=1e-5)
    # and the kernel itself tracks the plain composition (bf16 matmuls)
    np.testing.assert_allclose(np.asarray(piped, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)
