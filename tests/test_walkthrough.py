"""The walkthrough (mirror of ref notebook/VLSA-Walkthrough.ipynb) must run
end-to-end — including the raw-tiles -> CONCH features -> VLSA ->
interpretation path — so the demo surface cannot silently rot."""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_walkthrough_from_raw_tiles(tmp_path):
    tiles = np.random.default_rng(0).integers(
        0, 255, (12, 96, 96, 3), dtype=np.uint8)
    src = tmp_path / "tiles.npy"
    np.save(src, tiles)
    out = tmp_path / "wt_out"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               VLSA_TPU_COMPILE_CACHE=os.environ.get(
                   "VLSA_TPU_TEST_CACHE", "/root/.cache/jax_test_comp_cache"))
    r = subprocess.run(
        [sys.executable, "examples/walkthrough.py", "--ckpt", "/nonexistent",
         "--tiles", str(src), "--tile_image_size", "64", "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "extracted 12 tiles -> 512-d CONCH features" in r.stdout
    assert "incidence function:" in r.stdout
    for png in ("incidence.png", "shap.png", "ordinality.png",
                "wsi_heatmap.png", "attention_heatmaps.png",
                "abmil_attention.png"):
        assert (out / png).exists(), f"missing {png}"
