"""Mesh-scaling evidence (VERDICT r3 next#4): the production TrainEngine
train step, FIXED global batch, data-parallel meshes of growing size on the
8-device virtual CPU mesh — the loss after one update must be identical
(f32 tolerance) at every mesh size: sharding must not change the math.

Reference context: the reference has no distributed training at all
(SURVEY.md §2.8); this protects the TPU-native mesh path we added.
Wall-time rows land in SCALING_CPU.json via scripts/scaling_cpu.py.
"""
import importlib.util
import os.path as osp

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_scaling_module():
    spec = importlib.util.spec_from_file_location(
        "scaling_cpu", osp.join(REPO, "scripts", "scaling_cpu.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dp_mesh_scaling_loss_invariant(tmp_path):
    run = _load_scaling_module().run

    result = run(small=True, n_patches=256, global_batch=8, steps=1,
                 mesh_sizes=(1, 2, 4, 8))
    assert result["loss_max_dev_across_meshes"] < 5e-5
    assert len(result["mesh_rows"]) == 4
    # every mesh size produced a finite loss and a positive step time
    for row in result["mesh_rows"]:
        assert row["step_ms"] > 0
        assert row["loss_after_step1"] == pytest.approx(
            result["mesh_rows"][0]["loss_after_step1"], abs=5e-5)
