"""Wall-clock speed measurement, tunnel-safe.

Reference: NeRD-Rain test_speed.py:43-70 (cuda.synchronize-bracketed
per-image average) and 20251113_lsnet_xy/speed.py (throughput). On this
stack ``block_until_ready`` does NOT synchronize through the axon tunnel,
so the measurement chains N iterations inside ONE jit and reads back a
scalar — pure device time, amortizing the fixed per-invocation RTT
(~26 ms measured on v5e via axon).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_forward(apply_fn, x, chain: int = 16, repeats: int = 3,
                  decay: float = 0.999):
    """Returns best seconds per forward of ``apply_fn`` on input ``x``.

    ``apply_fn`` must map an array to an array of the same shape (whole-image
    restoration); iterations are chained (each consumes the previous output
    scaled by ``decay``) so XLA cannot elide them.
    """

    @jax.jit
    def run(x):
        def body(_, acc):
            out = apply_fn(acc * decay)
            if isinstance(out, (tuple, list)):
                out = out[0]
            return out.astype(acc.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, x))

    float(run(x))  # compile + warmup with forced readback
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def megapixels_per_second(apply_fn, x, **kw) -> float:
    sec = timed_forward(apply_fn, x, **kw)
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    return b * h * w / sec / 1e6
