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


_VLSA_KEYS = {
    "task": "vlsa", "arch": "VLSA", "vlsa_api": "CONCH",
    "path_patch": "synthetic://N=96,D=64,seed=5",
    "path_clip_model": None,
    "model_saver_module_filter": "prompt_encoder",
    "vlsa_frozen_logit_scale": False,
    "vlsa_img_encoder_name": "VLFAN", "vlsa_img_encoder_frozen": False,
    "vlsa_img_encoder_dim_in": 64, "vlsa_img_encoder_dim_hid": 32,
    "vlsa_img_encoder_use_feat_proj": False,
    "vlsa_img_encoder_drop_rate": 0.0,
    "vlsa_img_encoder_pred_head": "default",
    "vlsa_img_encoder_query": "Text", "vlsa_img_encoder_num_query": None,
    "vlsa_img_encoder_query_pooling": "mean",
    "vlsa_img_encoder_gated_query": False,
    "vlsa_img_encoder_query_text_method": "TaskRes",
    "vlsa_img_encoder_query_text_res_ratio": 0.5,
    "vlsa_img_encoder_query_text_load_path":
        "vlsa_tpu/assets/tools/survival_text_prototypes.json",
    "vlsa_img_encoder_query_text_load_idx": "tcga_blca_0",
    "vlsa_txt_encoder_name": "mahmoodlab/conch",
    "vlsa_txt_encoder_frozen": True,
    "vlsa_pmt_learner_name": "CoOp", "vlsa_pmt_learner_pretrained": False,
    "vlsa_pmt_learner_coop_ckpt": None,
    "vlsa_pmt_learner_coop_method": "rank",
    "vlsa_pmt_learner_coop_num_ranks": None,
    "vlsa_pmt_learner_coop_num_base_ranks": 4,
    "vlsa_pmt_learner_coop_num_tokens_per_rank": 4,
    "vlsa_pmt_learner_coop_num_context_tokens": 8,
    "vlsa_pmt_learner_coop_rank_tokens_position": "tail",
    "vlsa_pmt_learner_coop_init_prompt_path":
        "vlsa_tpu/assets/tools/survival_prompts.json",
    "vlsa_pmt_learner_coop_init_prompt_rank_idx": 0,
    "vlsa_pmt_learner_coop_init_prompt_context_idx": 0,
    "vlsa_pmt_learner_coop_rank_specific_context": False,
    "vlsa_pmt_learner_coop_frozen_context_embeds": False,
    "vlsa_pmt_learner_coop_frozen_rank_embeds": False,
    "loss_type": "SurvIFMLE", "evaluator": "VL-IF",
    # tiny text tower so the 3 CPU subprocesses stay fast
    "_test_tower_overrides": {"width": 32, "heads": 4, "layers": 2,
                              "output_dim": 64},
    # data=2 x model=2: the full TP+SP engine path (tower MLP sharded over
    # `model`, VLFAN routed through the SP shard_map) under 2 processes
    "mesh": {"data": 2, "model": 2},
}


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


@pytest.mark.slow
def test_two_process_vlsa_tp_sp_matches_single_process(tmp_path):
    """The FULL VLSA engine path (frozen text tower, TP over `model`,
    VLFAN sequence parallelism, VL-IF eval) across two real processes:
    both processes must agree exactly, and match the single-process run
    on the same 4-device data=2 x model=2 mesh."""
    sys.path.insert(0, osp.join(REPO, "tests"))
    from test_runner_e2e import make_cohort
    table, split = make_cohort(tmp_path, n_patients=24, seed=11)

    port = _free_port()
    cfgs = []
    for pid in (0, 1):
        cfg_path = tmp_path / f"cfg_vmh{pid}.yaml"
        cfg = _write_cfg(cfg_path, tmp_path, table, split, f"result-vmh{pid}",
                         n_cpu_devices=2,
                         distributed={"coordinator_address":
                                      f"127.0.0.1:{port}",
                                      "num_processes": 2, "process_id": pid})
        cfg.update(_VLSA_KEYS)
        cfg["save_path"] = str(tmp_path / f"result-vmh{pid}")
        import yaml
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        cfgs.append(str(cfg_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "main.py", "--config", c, "--handler", "VLSA"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for c in cfgs]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    cfg_sp = tmp_path / "cfg_vsp.yaml"
    cfg = _write_cfg(cfg_sp, tmp_path, table, split, "result-vsp",
                     n_cpu_devices=4)
    cfg.update(_VLSA_KEYS)
    cfg["save_path"] = str(tmp_path / "result-vsp")
    import yaml
    with open(cfg_sp, "w") as f:
        yaml.safe_dump(cfg, f)
    r = subprocess.run(
        [sys.executable, "main.py", "--config", str(cfg_sp),
         "--handler", "VLSA"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]

    m0 = _final_test_metrics(tmp_path / "result-vmh0")
    m1 = _final_test_metrics(tmp_path / "result-vmh1")
    msp = _final_test_metrics(tmp_path / "result-vsp")
    assert m0 and m1 and msp
    for k in m0:
        assert np.isclose(m0[k], m1[k], atol=1e-9), (k, m0[k], m1[k])
    for k in ("c_index", "loss", "IBS", "c_index2"):
        assert np.isclose(m0[k], msp[k], rtol=1e-4, atol=1e-5), \
            (k, m0[k], msp[k])
