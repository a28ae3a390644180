"""Validate XLA's "bytes accessed" cost-analysis field against a
known-traffic streaming kernel (VERDICT r3 task 4c).

A single fused elementwise map over N fp32 elements must move exactly
4N bytes in + 4N bytes out of HBM — no reuse, no double counting. We
compile ``y = 2x + 1`` chained K times inside one jit (the bench.py timing
pattern; XLA counts the fori_loop body once, so the reported totals are
per-iteration), then check:

  1. reported bytes == 2 * 4N within 5%  (the estimator is calibrated on
     programs XLA fully understands), and
  2. measured achieved GB/s from those bytes lands BELOW the 819 GB/s HBM
     peak and above 50% of it (a pure stream should run near the roofline;
     if it reported >100% the estimator or the timing would be broken).

Writes tools/bytes_validation.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MB fp32
    x = jnp.arange(n, dtype=jnp.float32).reshape(8192, 8192)
    chain = 64

    def prog(v):
        def body(_, acc):
            return acc * 2.0 + 1.0

        return jnp.sum(jax.lax.fori_loop(0, chain, body, v)[:1, :1])

    compiled = jax.jit(prog).lower(x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
    reported = float(ca.get("bytes accessed", 0.0))
    analytic = 2 * 4 * n  # one read + one write of the loop-carried buffer

    float(compiled(x))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(x))
        best = min(best, (time.perf_counter() - t0) / chain)
    gbps = analytic / best / 1e9

    out = {
        "analytic_bytes": analytic,
        "reported_bytes": reported,
        "reported_over_analytic": round(reported / analytic, 4),
        "measured_gbps": round(gbps, 1),
        "pct_hbm_peak": round(100.0 * gbps / V5E_HBM_GBPS, 1),
        "ok": bool(abs(reported / analytic - 1.0) < 0.05
                   and 0.5 * V5E_HBM_GBPS < gbps <= 1.02 * V5E_HBM_GBPS),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bytes_validation.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
