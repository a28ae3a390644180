"""Per-branch time budget of the fused MEFC Subnet (VERDICT r4 task 6
fallback deliverable): times the FUSED Subnet at the serving shape under
IR_MEFC_ONLY ∈ {all, sep, dil, pool} to locate where the 4 op-mixture
steps spend their time. IR_MEFC_ONLY drops branches (wrong results,
timing only), so the deltas attribute cost to branch families.

Lean protocol for the slow-compile tunnel: one chain length per variant
plus a shared glue baseline (2 compiles per variant). Each variant runs
in a SUBPROCESS because IR_MEFC_ONLY is captured at import time.

Run: python tools/mefc_budget.py            (drives the subprocesses)
     python tools/mefc_budget.py --one X    (one variant, in-process)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C, H, W = 96, 512, 512
N = 6


def one(tag):
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.models.drsformer import Subnet

    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, C),
                          jnp.bfloat16) * 0.1

    def glue(z):
        acc = z
        for _ in range(N):
            acc = jnp.clip(acc, -2.0, 2.0) * 0.999
        return jnp.sum(acc.astype(jnp.float32))

    def timed(prog):
        t0 = time.time()
        v = float(prog(x))
        assert v == v
        sys.stderr.write(f"(compile {time.time()-t0:.0f}s)\n")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(prog(x))
            best = min(best, time.perf_counter() - t0)
        return best

    tg = timed(jax.jit(glue))
    mod = Subnet(C, fused=True, dtype=jnp.bfloat16)
    p = mod.init(jax.random.PRNGKey(0), x)

    def prog(z):
        acc = z
        for _ in range(N):
            acc = mod.apply(p, jnp.clip(acc, -2.0, 2.0) * 0.999).astype(
                z.dtype)
        return jnp.sum(acc.astype(jnp.float32))

    t = timed(jax.jit(prog))
    ms = (t - tg) / N * 1e3
    print(json.dumps({"variant": tag, "ms_per_subnet": round(ms, 2)}))


def main():
    results = {}
    for tag, env in (("all", ""), ("sep", "sep"), ("dil", "dil"),
                     ("pool", "pool")):
        e = dict(os.environ)
        if env:
            e["IR_MEFC_ONLY"] = env
        out = subprocess.run(
            [sys.executable, "-u", __file__, "--one", tag], env=e,
            capture_output=True, text=True, timeout=2400)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(out.stdout.strip(), flush=True)
        if line:
            results[tag] = json.loads(line[-1])["ms_per_subnet"]
        else:
            print(out.stderr[-500:], flush=True)
    if "all" in results:
        print(json.dumps({"shape": f"{H}x{W} c={C}", "ms": results},
                         indent=1))


if __name__ == "__main__":
    if "--one" in sys.argv:
        one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
