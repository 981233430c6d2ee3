"""Smoke-test the driver's benchmark entry point (bench.py).

The driver runs `python bench.py` on the real chip at the end of every
round and records the JSON it prints; a silent breakage there loses the
round's headline number (BENCH_r03 rc=124 lost round 3's; BENCH_r04's
final line outgrew the driver's last-2000-char tail capture and the
headline fields — at the FRONT of the line — were truncated away).

The stdout contract under test (VERDICT r4 #1/#2):

  * the FIRST stdout line is a provisional headline (value null) flushed
    before ANY import/compile work — a kill at any point leaves a
    parseable final line;
  * every subsequent stdout line is a COMPACT record (< 1500 chars) with
    metric/value/unit/vs_baseline + a flat detail summary;
  * the LAST line still parses after a last-2000-char tail truncation;
  * the FULL record goes to BENCH_FULL_LAST.json, never stdout;
  * a run at a non-baseline config reports vs_baseline=null (ADVICE r3 #1).

NOT marked slow: this is the quick-tier guard against losing the
end-of-round chip run (ADVICE r3 #4).
"""
import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _smoke_env(tmp_path=None, **over):
    # ambient VLSA_TPU_BENCH_* vars (e.g. a dev machine's FEATS_DTYPE pin)
    # must not leak into the assertions — strip them all first (ADVICE r3 #3)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("VLSA_TPU_BENCH_")}
    if tmp_path is not None:
        # keep the repo-root BENCH_FULL_LAST.json (the chip run's full
        # record) out of reach of smoke runs — a post-bench pytest must
        # not clobber the round's evidence
        env["VLSA_TPU_BENCH_FULL_PATH"] = str(tmp_path / "bench_full.json")
    env.update(
        JAX_PLATFORMS="cpu",
        VLSA_TPU_BENCH_SMALL="1",
        VLSA_TPU_BENCH_B="2",
        VLSA_TPU_BENCH_N="512",
        VLSA_TPU_BENCH_SCAN_N="2",
        VLSA_TPU_BENCH_INTERP_B="2",
        VLSA_TPU_BENCH_BUDGET_S="900",
        # TPU-gated lanes (extract / other-storage) skip themselves on CPU
    )
    env.update(over)
    return env


def _json_lines(stdout):
    return [l for l in stdout.strip().splitlines() if l.startswith("{")]


def test_bench_smoke_cpu(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900,
        env=_smoke_env(tmp_path), cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = _json_lines(out.stdout)
    assert len(lines) >= 2, f"expected provisional + final:\n{out.stdout}"

    # line 1: the provisional headline, printed before any compile
    prov = json.loads(lines[0])
    assert prov["value"] is None and prov["unit"] == "slides/sec"
    assert "provisional" in prov["note"]

    # every line is compact — the driver's 2000-char tail capture can
    # never cut the headline fields off the front again (BENCH_r04)
    for l in lines:
        assert len(l) < 1500, f"stdout line too long ({len(l)} chars)"

    first, rec = json.loads(lines[1]), json.loads(lines[-1])
    for r in (first, rec):
        assert r["unit"] == "slides/sec"
        assert r["value"] > 0
        assert "vs_baseline" in r
        assert r["bench_schema_version"] == 2
    assert first["value"] == rec["value"]
    assert first["metric"] == rec["metric"]
    assert rec["metric"] == "slides/sec at 0.5k-patch bags (train+infer step)"

    # the LAST line survives the driver's last-2000-char tail capture
    tail = out.stdout[-2000:]
    tail_last = [l for l in tail.strip().splitlines()
                 if l.startswith("{")][-1]
    tr = json.loads(tail_last)
    assert tr["value"] == rec["value"]

    # non-baseline config (small tower, B=2, N=512) => no baseline ratio
    assert rec["vs_baseline"] is None

    d = rec["detail"]
    assert d["batch_bags"] == 2
    assert d["patches_per_bag"] == 512
    assert d["train_step_ms"] > 0 and d["infer_step_ms"] > 0
    # int8 is the default storage lane even on CPU (XLA fallback kernels)
    assert d["feats_dtype"] == "int8"
    # the precomputed-text eval lane ran (CPU-enabled)
    assert d["infer_step_precomputed_text_ms"] > 0
    # the interpretation lane ran and did not error
    assert "interpretation" in d["lanes_completed"], d
    assert d["interp_patients_per_sec"] > 0

    # the FULL record (roofline etc.) lives in the file, not stdout
    with open(tmp_path / "bench_full.json") as f:
        full = json.load(f)
    assert full["value"] == rec["value"]
    assert full["detail"]["roofline"]["train_achieved_tflops"] >= 0
    assert "error" not in full["detail"].get("interpretation", {})


def test_bench_budget_degrades_not_dies(tmp_path):
    """With a budget that expires right after the headline, bench.py must
    still exit 0 and print the headline line; optional lanes report
    'skipped' instead of timing out (VERDICT r3 next#1)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900,
        env=_smoke_env(tmp_path, VLSA_TPU_BENCH_BUDGET_S="0"), cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = _json_lines(out.stdout)
    assert lines
    rec = json.loads(lines[-1])
    assert rec["value"] > 0
    # the CPU-enabled optional lanes were skipped, not run and not errored
    assert "infer_step_precomputed_text_ms" not in rec["detail"]
    assert rec["detail"].get("lanes_completed", []) == []
    with open(tmp_path / "bench_full.json") as f:
        full = json.load(f)
    assert "skipped" in full["detail"].get("infer_precomputed_text", {})
    interp = full["detail"].get("interpretation")
    assert interp is not None and "skipped" in interp, interp


def test_bench_killed_mid_compile_leaves_parseable_line(tmp_path):
    """Kill bench.py before the headline completes: the provisional line
    must already be on stdout, complete and parseable, so the driver's
    tail capture never ends mid-line again (VERDICT r4 #2 'done'
    criterion, tested by killing a subprocess mid-compile)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=_smoke_env(tmp_path), cwd=REPO)
    try:
        # the provisional line is the FIRST statement of main(): readline
        # returns it long before the build/compile finishes
        first = proc.stdout.readline()
        proc.send_signal(signal.SIGKILL)
        rest = proc.stdout.read()
    finally:
        proc.wait(timeout=60)
    assert first.startswith("{") and first.endswith("\n")
    prov = json.loads(first)
    assert prov["unit"] == "slides/sec" and prov["value"] is None
    assert "metric" in prov and "vs_baseline" in prov
    # the stream up to the kill is whole lines only — the last line of any
    # tail capture is parseable
    stream = (first + rest).strip()
    if stream:
        last = stream.splitlines()[-1]
        if last.startswith("{"):
            json.loads(last)
