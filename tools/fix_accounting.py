"""Regenerate BENCH_secondary.json's DERIVED fields under the single
preopt-unrolled FLOP convention (VERDICT r4 task 3) without re-running the
chip: measured ms_per_img / bytes rows are untouched; only flops (from
tools/roofline_static.json), achieved_tflops, pct_peak_bf16, the re-derived
`bound` label, the >100%-of-peak note, and the per-family A100 baseline
estimate (bench.py A100_EST) are recomputed.

Run: python tools/fix_accounting.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def main():
    sec_path = os.path.join(REPO, "BENCH_secondary.json")
    data = json.load(open(sec_path))
    static = json.load(open(bench.STATIC_PATH))

    for key in sorted(data):
        if not key.endswith("_roofline"):
            continue
        name = key[: -len("_roofline")]
        rl = data[key]
        size = 224 if name == "vig" else 512
        ent = static.get(f"{name}@{size}")
        secs = rl["ms_per_img"] / 1e3
        if name in bench.FUSED and ent and "flops" in ent:
            rl["gflop_per_img"] = round(ent["flops"] / 1e9, 1)
            rl["flops_source"] = "preopt_unrolled_cached"
            rl["achieved_tflops"] = round(ent["flops"] / secs / 1e12, 2)
            rl["pct_peak_bf16"] = round(
                100.0 * rl["achieved_tflops"] / bench.V5E_PEAK_BF16_TFLOPS, 1)
        pct_hbm = rl.get("pct_peak_hbm", 0.0)
        pct_bf16 = rl.get("pct_peak_bf16", 0.0)
        if max(pct_hbm, pct_bf16) < 50.0:
            rl["bound"] = "kernel"
        else:
            rl["bound"] = "bandwidth" if pct_hbm >= pct_bf16 else "compute"
        if pct_hbm > 100.0 and "note" not in rl:
            rl["note"] = ("bytes-accessed exceeds HBM peak: upper bound "
                          "(fusion reuse)")
        mps_key = f"{name}512_mps" if name != "vig" else "vig224_mps"
        mps = data.get(mps_key)
        if mps is not None and name in bench.A100_EST:
            lo, hi = bench.A100_EST[name]
            rl["a100_est"] = {
                "band_mps": [lo, hi], "pinned_mps": lo,
                "vs_baseline_est": round(mps / lo, 2),
                "note": "roofline estimate, assumptions in bench.py "
                        "A100_EST; denominator pinned at band bottom",
            }
        print(f"{name:14s} flops={rl['gflop_per_img']:9.1f}G "
              f"src={rl['flops_source']:24s} bound={rl['bound']}")

    with open(sec_path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print("BENCH_secondary.json rewritten")


if __name__ == "__main__":
    main()
