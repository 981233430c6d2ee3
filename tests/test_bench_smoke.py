"""Smoke-test the driver's benchmark entry point (bench.py).

The driver runs `python bench.py` on the real chip at the end of every
round and records the single JSON line it prints; a silent breakage there
loses the round's headline number.  This runs the same script end-to-end
on CPU with tiny shapes (small test tower, short scans) and asserts the
output contract: one parseable JSON line with the metric/value/vs_baseline
fields and the roofline + lane details the judge reads.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_cpu():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        VLSA_TPU_BENCH_SMALL="1",
        VLSA_TPU_BENCH_B="2",
        VLSA_TPU_BENCH_N="512",
        VLSA_TPU_BENCH_SCAN_N="2",
        VLSA_TPU_BENCH_INTERP_B="2",
        # TPU-gated lanes (extract / other-storage) skip themselves on CPU
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in bench output:\n{out.stdout[-2000:]}"
    rec = json.loads(lines[-1])

    assert rec["unit"] == "slides/sec"
    assert rec["value"] > 0
    assert "vs_baseline" in rec and rec["vs_baseline"] > 0
    d = rec["detail"]
    assert d["batch_bags"] == 2
    assert d["patches_per_bag"] == 512
    assert d["train_step_ms"] > 0 and d["infer_step_ms"] > 0
    assert "roofline" in d and d["roofline"]["train_achieved_tflops"] >= 0
    # int8 is the default storage lane even on CPU (XLA fallback kernels)
    assert d["feats_dtype"] == "int8"
    # the interpretation lane ran and did not error
    assert "interpretation" in d, d.keys()
    assert "error" not in d["interpretation"], d["interpretation"]
    assert d["interpretation"]["patients_per_sec"] > 0
