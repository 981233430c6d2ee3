"""End-to-end runner tests on synthetic cohorts: SA baseline (ABMIL+SurvIFMLE)
and full VLSA (rank prompts + VLFAN text queries + IFMLE/EMD) train, evaluate,
checkpoint, and write predictions."""
import os

import numpy as np
import pandas as pd
import pytest

from vlsa_tpu.runner import SAHandler, VLSAHandler

RNG = np.random.default_rng(3)


def make_cohort(tmp_path, n_patients=36, seed=7):
    # per-call generator: cohort labels must not depend on test order
    rng = np.random.default_rng(seed + n_patients)
    rows = []
    for i in range(n_patients):
        pid = f"P{i:03d}"
        t = round(float(rng.uniform(2, 90)), 2)
        e = int(rng.random() < 0.6)
        rows.append({"pathology_id": pid + "-slide", "patient_id": pid, "e": e, "t": t})
    table = tmp_path / "survival.csv"
    pd.DataFrame(rows).to_csv(table, index=False)
    pids = [r["patient_id"] for r in rows]
    n_train = int(n_patients * 0.7)
    split = tmp_path / "splits_0.csv"
    pd.DataFrame({
        "train": pd.Series(pids[:n_train]),
        "val": pd.Series(pids[n_train:]),
    }).to_csv(split, index=False)
    return str(table), str(split)


def base_cfg(tmp_path, table, split):
    return {
        "task": "sa",
        "seed": 42,
        "save_path": str(tmp_path / "result"),
        "save_prediction": True,
        "eval_training_loader_per_epoch": False,
        "ckpt_for_eval": "last",
        "num_shot": -1,
        "dataset_name": "tcga_test",
        "path_patch": "synthetic://N=96,D=64,seed=3",
        "path_coord": None,
        "path_table": table,
        "data_mode": "patch",
        "path_cluster": None,
        "path_graph": None,
        "feat_format": "pt",
        "time_format": "interval",
        "time_bins": None,
        "data_split_path": split,
        "data_split_seed": 0,
        "arch": "DeepMIL",
        "init_wt": False,
        "net_output_converter": "softmax",
        "net_dims": "64-32-4",
        "deepmil_network": "ABMIL",
        "deepmil_pooling": "attention",
        "deepmil_use_feat_proj": False,
        "loss_type": "SurvIFMLE",
        "loss_survifmle_weight": 1.0,
        "evaluator": "NLL-IF",
        "opt_name": "adam",
        "opt_lr": 0.001,
        "opt_weight_decay": 0.00001,
        "epochs": 2,
        "batch_size": 1,
        "bp_every_batch": 8,
        "num_workers": 0,
        "es": False,
        "monitor_metrics": "loss",
        "lrs": False,
        "test": False,
        "min_bucket": 64,
    }


def test_sa_abmil_end_to_end(tmp_path):
    table, split = make_cohort(tmp_path)
    cfg = base_cfg(tmp_path, table, split)
    handler = SAHandler(cfg)
    metrics = handler.exec()
    assert "test" in metrics
    names = [m[0] for m in metrics["test"]]
    assert "pred_c_index" in names and "pred_loss" in names
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0
    assert np.isfinite(vals["pred_loss"])
    # artifacts written
    assert os.path.exists(os.path.join(cfg["save_path"], "train_model-last.ckpt"))
    assert os.path.exists(os.path.join(cfg["save_path"], "sa_train_last_pred_test.csv"))
    # prediction CSV has risk + survival columns
    df = pd.read_csv(os.path.join(cfg["save_path"], "sa_train_last_pred_test.csv"))
    assert "risk" in df.columns and "surf_1" in df.columns


def vlsa_cfg(tmp_path, table, split):
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "task": "vlsa",
        "arch": "VLSA",
        "save_path": str(tmp_path / "result-vlsa"),
        "vlsa_api": "CONCH",
        "path_clip_model": None,
        "model_saver_module_filter": "prompt_encoder",
        "vlsa_frozen_logit_scale": False,
        "vlsa_img_encoder_name": "VLFAN",
        "vlsa_img_encoder_frozen": False,
        "vlsa_img_encoder_dim_in": 64,
        "vlsa_img_encoder_dim_hid": 32,
        "vlsa_img_encoder_use_feat_proj": False,
        "vlsa_img_encoder_drop_rate": 0.25,
        "vlsa_img_encoder_pred_head": "default",
        "vlsa_img_encoder_query": "Text",
        "vlsa_img_encoder_num_query": None,
        "vlsa_img_encoder_query_pooling": "mean",
        "vlsa_img_encoder_gated_query": False,
        "vlsa_img_encoder_query_text_method": "TaskRes",
        "vlsa_img_encoder_query_text_res_ratio": 0.5,
        "vlsa_img_encoder_query_text_load_path": "vlsa_tpu/assets/tools/survival_text_prototypes.json",
        "vlsa_img_encoder_query_text_load_idx": "tcga_blca_0",
        "vlsa_txt_encoder_name": "mahmoodlab/conch",
        "vlsa_txt_encoder_frozen": True,
        "vlsa_pmt_learner_name": "CoOp",
        "vlsa_pmt_learner_pretrained": False,
        "vlsa_pmt_learner_coop_ckpt": None,
        "vlsa_pmt_learner_coop_method": "rank",
        "vlsa_pmt_learner_coop_num_ranks": None,
        "vlsa_pmt_learner_coop_num_base_ranks": 4,
        "vlsa_pmt_learner_coop_num_tokens_per_rank": 4,
        "vlsa_pmt_learner_coop_num_context_tokens": 8,
        "vlsa_pmt_learner_coop_rank_tokens_position": "tail",
        "vlsa_pmt_learner_coop_init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
        "vlsa_pmt_learner_coop_init_prompt_rank_idx": 0,
        "vlsa_pmt_learner_coop_init_prompt_context_idx": 0,
        "vlsa_pmt_learner_coop_rank_specific_context": False,
        "vlsa_pmt_learner_coop_frozen_context_embeds": False,
        "vlsa_pmt_learner_coop_frozen_rank_embeds": False,
        "loss_type": "SurvIFMLE-SurvEMD",
        "loss_survifmle_weight": 1.0,
        "loss_survemd_weight": 1.0,
        "loss_survemd_p": 2,
        "evaluator": "VL-IF",
        # tiny text tower so the CPU test is fast
        "_test_tower_overrides": {"width": 32, "heads": 4, "layers": 2,
                                  "output_dim": 64},
    })
    return cfg


def test_vlsa_end_to_end(tmp_path):
    table, split = make_cohort(tmp_path, n_patients=30)
    cfg = vlsa_cfg(tmp_path, table, split)
    handler = VLSAHandler(cfg)
    import jax, copy
    tower_before = jax.tree.map(np.array, dict(handler.params)["prompt_encoder"])
    # logit_scale + prompt learner params must be trainable; tower frozen
    metrics = handler.exec()
    tower_after = dict(handler.params)["prompt_encoder"]
    for a, b in zip(jax.tree.leaves(tower_before), jax.tree.leaves(tower_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0
    assert np.isfinite(vals["pred_loss"])
    # the frozen text tower must be excluded from the checkpoint
    from vlsa_tpu.runner.ckpt import load_checkpoint
    ck = load_checkpoint(os.path.join(cfg["save_path"], "train_model-last.ckpt"))
    assert "prompt_encoder" not in ck["model"]
    assert "prompt_learner" in ck["model"]


def test_resume_model_roundtrip(tmp_path):
    """resume_model restores params AND optimizer moments (ref
    base_handler.py:641-693 saves {'epoch','model','optimizer'})."""
    import jax
    table, split = make_cohort(tmp_path)
    cfg = base_cfg(tmp_path, table, split)
    cfg["epochs"] = 1
    h = SAHandler(cfg)
    h.exec()

    cfg2 = dict(cfg, save_path=cfg["save_path"])
    h2 = SAHandler(cfg2)
    epoch = h2.resume_model(ckpt_type="last", run_name="train")
    assert epoch == 1
    for a, b in zip(jax.tree.leaves(h2.params), jax.tree.leaves(h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # optimizer moments restored (adam mu non-zero after an epoch of steps)
    mus = [x for x in jax.tree.leaves(h2.opt_state) if hasattr(x, "shape")]
    assert any(np.abs(np.asarray(m)).sum() > 0 for m in mus)


def test_seeded_run_determinism(tmp_path):
    """Same cfg + seed -> identical final params (ref utils/func.py
    seed_everything semantics carried to JAX PRNG keys)."""
    import jax
    table, split = make_cohort(tmp_path)
    cfg = base_cfg(tmp_path, table, split)
    cfg["epochs"] = 1
    h1 = SAHandler(dict(cfg, save_path=str(tmp_path / "r1")))
    h1.exec()
    h2 = SAHandler(dict(cfg, save_path=str(tmp_path / "r2")))
    h2.exec()
    for a, b in zip(jax.tree.leaves(h1.params), jax.tree.leaves(h2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vlsa_scan_tower_end_to_end(tmp_path):
    """vlsa_txt_encoder_scan_layers: the stacked-layer lax.scan tower runs
    the full VLSA training/eval lifecycle (frozen-tower filter, ckpt,
    predictions) just like the unrolled layout."""
    table, split = make_cohort(tmp_path, n_patients=20)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({"save_path": str(tmp_path / "result-scan"), "epochs": 1,
                "vlsa_txt_encoder_scan_layers": True})
    handler = VLSAHandler(cfg)
    params = dict(handler.params)
    assert "blocks" in dict(params["prompt_encoder"]), \
        "scan_layers should produce the stacked blocks layout"
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0 and np.isfinite(vals["pred_loss"])
    from vlsa_tpu.runner.ckpt import load_checkpoint
    ck = load_checkpoint(os.path.join(cfg["save_path"], "train_model-last.ckpt"))
    assert "prompt_encoder" not in ck["model"]
