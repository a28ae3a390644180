"""On-TPU numeric check: fused_drs_block (DRSformer whole-block 2-pass
canvas kernel, kernels/drs_block_pallas) vs the plain composition.

The pytest suite covers the kernels in pallas interpret mode on CPU
(tests/test_drs_fused_block.py); this exercises the Mosaic-compiled
kernels on the real chip, including the span q^T k path (h*w >= 256^2)
and odd-hidden mixed-group slot layouts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.kernels.drs_block_pallas import (
    BORDER,
    _reference_drs_block,
    canvas_pad,
    canvas_unpad,
    fused_drs_block,
)


def check(c, h, w, heads, ln_type, bias, expansion=2.66, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype("float32")) * 0.1
    x = r(1, h, w, c).astype(jnp.bfloat16)
    hid = int(c * expansion)
    params = (
        jnp.abs(r(c)) + 0.5,                       # ln1w
        r(c) if ln_type != "BiasFree" else None,   # ln1b
        r(1, 1, c, 3 * c) * 0.5,                   # w_qkv
        r(3 * c) if bias else None,                # b_qkv
        r(3, 3, 1, 3 * c) * 0.5,                   # w_dw
        r(3 * c) if bias else None,                # b_dw
        jnp.abs(r(heads, 1, 1)) + 0.5,             # temperature
        tuple(r(1) + 0.2 for _ in range(4)),       # mix (attn1..4)
        r(1, 1, c, c) * 0.5,                       # w_proj
        r(c) if bias else None,                    # b_proj
        jnp.abs(r(c)) + 0.5,                       # ln2w
        r(c) if ln_type != "BiasFree" else None,   # ln2b
        r(1, 1, c, 2 * hid) * 0.5,                 # w_in
        r(2 * hid) if bias else None,              # b_in
        r(3, 3, 1, 2 * hid) * 0.5,                 # dw3 bank
        r(2 * hid) if bias else None,
        r(5, 5, 1, 2 * hid) * 0.5,                 # dw5 bank
        r(2 * hid) if bias else None,
        r(3, 3, 2, hid) * 0.5,                     # stage-2 3x3 bank
        r(hid) if bias else None,
        r(5, 5, 2, hid) * 0.5,                     # stage-2 5x5 bank
        r(hid) if bias else None,
        r(1, 1, 2 * hid, c) * 0.5,                 # w_out
        r(c) if bias else None,                    # b_out
    )
    cfg = (c, w, heads, ln_type, 1e-5)

    @jax.jit
    def run_fused(xx):
        return canvas_unpad(
            fused_drs_block(canvas_pad(xx, border=BORDER), params, cfg),
            w, c, border=BORDER)

    @jax.jit
    def run_ref(xx):
        return _reference_drs_block(xx, params, cfg)

    yf = np.asarray(run_fused(x), dtype=np.float32)
    yr = np.asarray(run_ref(x), dtype=np.float32)
    scale = np.abs(yr).max() + 1e-6
    rel = np.abs(yf - yr).max() / scale
    tag = f"c={c} h={h} w={w} heads={heads} {ln_type} bias={bias}"
    print(f"{tag:48s} maxrel={rel:.3e} {'OK' if rel < 2e-2 else 'FAIL'}",
          flush=True)
    return rel < 2e-2


if __name__ == "__main__":
    ok = True
    ok &= check(48, 64, 48, 1, "WithBias", False)     # hid=127 odd, mixed
    ok &= check(96, 64, 48, 2, "WithBias", True)      # hid=255 odd
    ok &= check(192, 32, 32, 4, "BiasFree", False)    # hid=510 even
    ok &= check(384, 16, 24, 8, "WithBias", False)
    # span q^T k path (h*w >= 256^2)
    ok &= check(48, 288, 256, 1, "WithBias", False)
    ok &= check(96, 256, 256, 2, "WithBias", False)
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)
