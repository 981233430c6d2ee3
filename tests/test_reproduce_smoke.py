"""CI protection for the one-command reproduction path (VERDICT r2 #7).

`scripts/reproduce_blca.py --smoke` is the script real-weight validation
will run the moment the CONCH checkpoint + TCGA features are mounted
(VERDICT r2 missing#2); this slow-tier test keeps its orchestration —
tower step, parity-gate subprocess, conversion, fold loop, C-index table,
summary.json — from rotting."""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_reproduce_blca_smoke(tmp_path):
    out = tmp_path / "repro"
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "scripts/reproduce_blca.py", "--smoke",
         "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    # the C-index table printed
    assert "5-fold" in r.stdout or "reproduction" in r.stdout
    assert "test c-index" in r.stdout
    # summary.json has one row per smoke fold with finite c-indices
    with open(out / "summary.json") as f:
        rows = json.load(f)
    assert len(rows) >= 1
    for row in rows:
        assert np.isfinite(row["test_c_index"]) and 0 <= row["test_c_index"] <= 1
