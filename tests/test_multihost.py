"""Real multi-process multi-host run (VERDICT r2 #3).

Every other multi-host test degenerates to process_count()==1; this one
launches TWO actual processes (jax.distributed over a localhost
coordinator, Gloo CPU collectives, 2 local devices each -> a 4-device
global mesh) and drives a small SA training + eval through the production
CLI (`main.py --handler SA`, cfg `distributed:` dict — main.py:72-73 calls
parallel.multihost.maybe_initialize_distributed).  It proves, outside
single-process degeneracy:

  * per-host `BagBatcher` shard loading (runner/base.py:248-254),
  * `make_global_batch` assembly of globally-shaped arrays from per-process
    shards (engine.shard_batch -> parallel/multihost.py),
  * eval collection via `host_allgather`/`collect_global`
    (runner/base.py:392-398) — both processes must compute IDENTICAL
    metrics from the globally gathered outputs,
  * metric equality with the same run on one process with the same
    4-device mesh (the multi-host path changes data placement, not math).
"""
import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_cfg(path, tmp_path, table, split, save_name, n_cpu_devices,
               distributed=None):
    cfg = {
        "task": "sa", "seed": 42, "wandb_prj": None,
        "save_path": str(tmp_path / save_name), "save_prediction": False,
        "eval_training_loader_per_epoch": False, "ckpt_for_eval": "last",
        "num_shot": -1, "dataset_name": "tcga_mh",
        "path_patch": "synthetic://N=96,D=32,seed=5", "path_coord": None,
        "path_table": table, "data_mode": "patch",
        "path_cluster": None, "path_graph": None,
        "feat_format": "pt", "time_format": "interval", "time_bins": None,
        "data_split_path": split, "data_split_seed": 0,
        "arch": "DeepMIL", "init_wt": False,
        "net_output_converter": "softmax", "net_dims": "32-16-4",
        "deepmil_network": "ABMIL", "deepmil_pooling": "attention",
        "deepmil_use_feat_proj": False, "deepmil_drop_rate": 0.0,
        "loss_type": "SurvIFMLE", "loss_survifmle_weight": 1.0,
        "evaluator": "NLL-IF",
        "opt_name": "adam", "opt_lr": 0.001, "opt_weight_decay": 0.00001,
        "epochs": 2, "batch_size": 1, "bp_every_batch": 8,
        "num_workers": 0, "min_bucket": 256, "fixed_bucket": 256,
        "es": False, "monitor_metrics": "loss", "lrs": False, "test": False,
        "jax_platforms": "cpu",
        "jax_num_cpu_devices": n_cpu_devices,
        "mesh": {"data": 4, "model": 1},
    }
    if distributed is not None:
        cfg["distributed"] = distributed
    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg


def _final_test_metrics(save_path):
    """Last 'eval' record carrying lastckpt test metrics."""
    out = {}
    with open(osp.join(save_path, "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            for k, v in d.items():
                if "test/pred/" in k:
                    out[k.split("test/pred/")[-1]] = v
    return out


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    sys.path.insert(0, osp.join(REPO, "tests"))
    from test_runner_e2e import make_cohort
    table, split = make_cohort(tmp_path, n_patients=24, seed=11)

    port = _free_port()
    cfgs = []
    for pid in (0, 1):
        cfg_path = tmp_path / f"cfg_mh{pid}.yaml"
        _write_cfg(cfg_path, tmp_path, table, split, f"result-mh{pid}",
                   n_cpu_devices=2,
                   distributed={"coordinator_address": f"127.0.0.1:{port}",
                                "num_processes": 2, "process_id": pid})
        cfgs.append(str(cfg_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "main.py", "--config", c, "--handler", "SA"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for c in cfgs]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    # single-process reference with the same 4-device mesh
    cfg_sp = tmp_path / "cfg_sp.yaml"
    _write_cfg(cfg_sp, tmp_path, table, split, "result-sp", n_cpu_devices=4)
    r = subprocess.run(
        [sys.executable, "main.py", "--config", str(cfg_sp), "--handler", "SA"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]

    m0 = _final_test_metrics(tmp_path / "result-mh0")
    m1 = _final_test_metrics(tmp_path / "result-mh1")
    msp = _final_test_metrics(tmp_path / "result-sp")
    assert m0 and m1 and msp

    # both processes computed metrics from the SAME globally gathered outputs
    for k in m0:
        assert np.isclose(m0[k], m1[k], atol=1e-9), (k, m0[k], m1[k])
    # and the 2-process run equals the single-process 4-device run
    for k in ("c_index", "loss", "IBS", "c_index2"):
        assert np.isclose(m0[k], msp[k], rtol=1e-4, atol=1e-5), \
            (k, m0[k], msp[k])
