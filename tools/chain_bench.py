"""Chained-differencing timing harness for per-block kernel work.

The axon tunnel does not synchronize ``block_until_ready`` — a jitted
program round-trips in ~25 ms regardless of content — so repeated-dispatch
timing reads tunnel latency, not kernel time. The only trustworthy
per-block number chains N applications inside ONE jit, forces a scalar
readback, and differences two chain lengths (COVERAGE.md, r3).

``marginal(fn, x, n1, n2)`` returns the marginal per-application seconds.
The chain is unrolled in Python (not fori_loop: some Pallas lowerings
reject the shifted layouts a loop-carried canvas imposes).
"""

import time

import jax
import jax.numpy as jnp


def _chain_prog(fn, x, n):
    def prog(z):
        acc = z
        for _ in range(n):
            acc = fn(jnp.clip(acc, -2.0, 2.0) * 0.999)
        return jnp.sum(acc.astype(jnp.float32))

    return jax.jit(prog)


def _time(prog, x, reps=5):
    val = float(prog(x))  # compile + warmup, forced via readback
    assert val == val, "chain produced NaN"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog(x))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(fn, x, n1=4, n2=12, reps=5):
    """Marginal per-application seconds of ``fn`` (shape-preserving)."""
    t1 = _time(_chain_prog(fn, x, n1), x, reps)
    t2 = _time(_chain_prog(fn, x, n2), x, reps)
    return (t2 - t1) / (n2 - n1)


def marginal_adaptive(fn, x, target_s=0.06, max_apps=48, reps=4):
    """Like ``marginal`` but sizes the chain so the differenced delta is at
    least ``target_s`` seconds of kernel work — at sub-ms per-block costs the
    default 8-application delta is comparable to tunnel jitter (r4 measured
    the SAME compiled program at 0.95 and 1.49 ms/block across runs).
    ``max_apps`` bounds XLA compile time of the unrolled chain."""
    est = marginal(fn, x, n1=2, n2=8, reps=2)
    dn = max(8, min(max_apps, int(target_s / max(est, 1e-5)) + 1))
    n1 = 2
    t1 = _time(_chain_prog(fn, x, n1), x, reps)
    t2 = _time(_chain_prog(fn, x, n1 + dn), x, reps)
    return (t2 - t1) / dn
