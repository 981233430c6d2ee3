#!/usr/bin/env python
"""Single-chip B-sweep to the throughput knee (VERDICT r3 next#8).

Runs bench.py as a subprocess over B in {128, 256, 512, 1024} at N=10240
for the int8 and bf16 storage lanes, headline timings only (optional lanes
off), and writes the slides/sec curve to BSWEEP.json + a markdown table to
stdout for docs/PERF.md.  Each point reuses the persistent compile cache,
so re-runs are cheap.

Usage: python scripts/bench_sweep.py [--bs 128,256,512,1024] [--n 10240]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(B: int, N: int, feats_dtype: str, budget: float) -> dict:
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("VLSA_TPU_BENCH_")}
    env.update(
        VLSA_TPU_BENCH_B=str(B),
        VLSA_TPU_BENCH_N=str(N),
        VLSA_TPU_BENCH_FEATS_DTYPE=feats_dtype,
        VLSA_TPU_BENCH_BUDGET_S=str(budget),
        # headline only: every optional lane off
        VLSA_TPU_BENCH_OTHER_LANE="0",
        VLSA_TPU_BENCH_PRE="0",
        VLSA_TPU_BENCH_EXTRACT="0",
        VLSA_TPU_BENCH_INTERP="0",
    )
    try:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, env=env,
                             cwd=REPO, timeout=budget + 300)
        stdout, stderr, rc = out.stdout, out.stderr, out.returncode
    except subprocess.TimeoutExpired as exc:
        # bench.py emits the headline JSON early and re-emits after each
        # lane — salvage whatever made it to stdout before the kill
        stdout = (exc.stdout or b"").decode() if isinstance(
            exc.stdout, bytes) else (exc.stdout or "")
        stderr = "TimeoutExpired"
        rc = -1
    lines = [l for l in (stdout or "").strip().splitlines()
             if l.startswith("{")]
    if not lines or (rc != 0 and stderr != "TimeoutExpired"):
        return {"B": B, "feats_dtype": feats_dtype,
                "error": (stderr or "")[-500:]}
    rec = json.loads(lines[-1])
    return {"B": B, "feats_dtype": feats_dtype,
            "slides_per_sec": rec["value"],
            "train_step_ms": rec["detail"]["train_step_ms"],
            "infer_step_ms": rec["detail"]["infer_step_ms"],
            "train_hbm_util_pct": rec["detail"]["roofline"]["train_hbm_util_pct"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="128,256,512,1024")
    ap.add_argument("--n", type=int, default=10240)
    ap.add_argument("--dtypes", default="int8,bfloat16")
    ap.add_argument("--budget", type=float, default=480.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BSWEEP.json"))
    args = ap.parse_args()

    rows = []
    for dtype in args.dtypes.split(","):
        for B in map(int, args.bs.split(",")):
            print(f"[sweep] B={B} dtype={dtype} ...", file=sys.stderr, flush=True)
            row = run_point(B, args.n, dtype, args.budget)
            rows.append(row)
            print(f"[sweep] -> {row}", file=sys.stderr, flush=True)

    result = {"n_patches": args.n, "rows": rows,
              "note": "headline-only bench.py sweep (scanned protocol, "
                      "optional lanes off), one real chip"}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)

    print("| feats | B | slides/s | train ms | infer ms | HBM util % |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['feats_dtype']} | {r['B']} | ERROR | | | |")
        else:
            print(f"| {r['feats_dtype']} | {r['B']} | {r['slides_per_sec']} "
                  f"| {r['train_step_ms']} | {r['infer_step_ms']} "
                  f"| {r['train_hbm_util_pct']} |")


if __name__ == "__main__":
    main()
