"""On-TPU numeric check: fused_block (2-pass canvas kernel) vs the plain
composition, at several shapes/head-counts incl. non-divisible-by-128 dims.

Run on the real TPU (the pytest suite pins CPU where the kernel falls back
to the reference composition, so this is the only place TPU numerics of the
kernels themselves are exercised).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_tpu.kernels.block_pallas import (
    canvas_pad,
    canvas_unpad,
    fused_block,
    _reference_block,
)


def check(c, h, w, heads, ln_type, bias, seed=0, gated=False):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype("float32")) * 0.1
    x = r(1, h, w, c).astype(jnp.bfloat16)
    hid = int(c * 2.66)
    # gated also exercises the per-sample (b, heads) temperature (CG-IR)
    temp = (jnp.abs(r(1, heads)) + 0.5) if gated else (jnp.abs(r(heads, 1, 1)) + 0.5)
    gate = jax.nn.sigmoid(r(1, c)) if gated else None
    params = (
        jnp.abs(r(c)) + 0.5,                       # ln1w
        r(c) if ln_type != "BiasFree" else None,   # ln1b
        r(c, 3 * c) * 0.5,                         # w_qkv
        r(3 * c) if bias else None,                # b_qkv
        r(3, 3, 1, 3 * c) * 0.5,                   # w_dw
        r(3 * c) if bias else None,                # b_dw
        temp,                                      # temperature
        r(c, c) * 0.5,                             # w_proj
        r(c) if bias else None,                    # b_proj
        jnp.abs(r(c)) + 0.5,                       # ln2w
        r(c) if ln_type != "BiasFree" else None,   # ln2b
        r(c, 2 * hid) * 0.5,                       # w_in
        r(2 * hid) if bias else None,              # b_in
        r(3, 3, 1, 2 * hid) * 0.5,                 # w_dw2
        r(2 * hid) if bias else None,              # b_dw2
        r(hid, c) * 0.5,                           # w_out
        r(c) if bias else None,                    # b_out
    )
    cfg = (c, w, heads, ln_type, 1e-5)

    @jax.jit
    def run_fused(xx):
        return canvas_unpad(fused_block(canvas_pad(xx), params, cfg, gate), w, c)

    @jax.jit
    def run_ref(xx):
        return _reference_block(xx, params, heads, ln_type, 1e-5, gate=gate)

    yf = np.asarray(run_fused(x), dtype=np.float32)
    yr = np.asarray(run_ref(x), dtype=np.float32)
    scale = np.abs(yr).max() + 1e-6
    rel = np.abs(yf - yr).max() / scale
    tag = f"c={c} h={h} w={w} heads={heads} {ln_type} bias={bias} gate={gated}"
    print(f"{tag:52s} maxrel={rel:.3e} {'OK' if rel < 2e-2 else 'FAIL'}")
    return rel < 2e-2


ok = True
ok &= check(96, 64, 48, 1, "WithBias", False)
ok &= check(96, 64, 48, 2, "WithBias", True)
ok &= check(48, 40, 56, 1, "BiasFree", False)
ok &= check(192, 32, 32, 4, "WithBias", False)
ok &= check(384, 16, 24, 8, "WithBias", False)
# large-grid shapes (h*w >= 256^2) take the relayout-free span q^T k path
ok &= check(48, 288, 256, 1, "WithBias", False)
ok &= check(96, 256, 320, 2, "WithBias", False)
# CG-IR extensions: per-sample temperature + per-channel output gate
ok &= check(96, 64, 48, 2, "WithBias", False, gated=True)
ok &= check(48, 288, 256, 1, "WithBias", False, gated=True)
print("ALL OK" if ok else "FAILURES PRESENT")
