"""Chained-diff marginal cost of fused_block at the bench-dominating shapes.

Usage: python tools/time_blocks.py [c h w heads]...
Defaults to the two 512^2 shapes (enc1 c=48, dec1 c=96) plus the MoCE-IR
small grids. r3 recorded marginals for comparison: 1.91 ms (512^2 c=48),
3.03 ms (512^2 c=96), 0.98 ms (256^2 c=96), 0.44 ms (128^2 c=192).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from chain_bench import marginal_adaptive
from image_restoration_tpu.kernels import block_pallas as bp
from profile_fused_block import make_params


def time_shape(c, h, w, heads):
    hidden = int(c * 2.66)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, c), jnp.bfloat16) * 0.1
    xc = bp.canvas_pad(x)
    params = make_params(key, c, hidden, heads)
    cfg = (c, w, heads, "WithBias", 1e-5)
    fn = lambda z: bp.fused_block(z, params, cfg, None)
    ms = marginal_adaptive(fn, xc) * 1e3
    print(f"  {h}x{w} c={c} heads={heads}: {ms:7.3f} ms/block")
    return ms


if __name__ == "__main__":
    shapes = [(48, 512, 512, 1), (96, 512, 512, 2),
              (96, 256, 256, 2), (192, 128, 128, 4)]
    if len(sys.argv) > 1:
        vals = [int(v) for v in sys.argv[1:]]
        shapes = [tuple(vals[i:i + 4]) for i in range(0, len(vals), 4)]
    for s in shapes:
        time_shape(*s)
