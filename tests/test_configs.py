"""The shipped config surface: every YAML under configs/ must load, pass
schema validation for its task, and grid-expand; the generated per-cohort
matrix (configs/IFMLE/, same layout as the reference's config/IFMLE/) must
match regeneration from the exemplars (scripts/gen_cohort_configs.py)."""
import glob
import os.path as osp
import subprocess
import sys

import pytest

from vlsa_tpu.config import args_grid, load_config
from vlsa_tpu.config_schema import validate_config

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
ALL_CONFIGS = sorted(
    glob.glob(osp.join(ROOT, "configs", "**", "*.yaml"), recursive=True))
COHORTS = ["tcga_blca", "tcga_brca", "tcga_gbmlgg", "tcga_luad", "tcga_ucec"]


def test_config_matrix_complete():
    """3 exemplars + 3 reference config types x 5 cohorts (ref config/IFMLE)."""
    assert len(ALL_CONFIGS) == 3 + 15
    for cohort in COHORTS:
        for name in ("cfg_sa_base_conch.yaml", "cfg_vlsa_conch.yaml",
                     "cfg_zero_shot_conch.yaml"):
            assert osp.join(ROOT, "configs", "IFMLE", cohort, name) \
                in ALL_CONFIGS


@pytest.mark.parametrize(
    "path", ALL_CONFIGS, ids=[osp.relpath(p, ROOT) for p in ALL_CONFIGS])
def test_config_loads_validates_expands(path):
    cfg = load_config(path)
    problems = validate_config(cfg, cfg["task"], strict=False)
    assert not problems, problems
    grid = args_grid(cfg)
    assert len(grid) >= 5  # at least the 5 CV folds
    assert all(isinstance(g["data_split_seed"], int) for g in grid)
    # cohort configs carry their own dataset; gbmlgg its shorter schedule
    name = osp.basename(osp.dirname(path))
    if name in COHORTS:
        assert cfg["dataset_name"] == [name]
        if name == "tcga_gbmlgg":
            assert cfg["epochs"] == 5 and cfg["bp_every_batch"] == 16
        else:
            assert cfg["epochs"] == 10 and cfg["bp_every_batch"] == 32


def test_generated_configs_not_stale():
    res = subprocess.run(
        [sys.executable, osp.join(ROOT, "scripts", "gen_cohort_configs.py"),
         "--check"], capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
