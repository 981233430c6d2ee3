"""Runner-mode coverage: zero-shot, few-shot, Cox head, quantile binning,
test-only mode, and grid expansion semantics."""
import os

import numpy as np
import pandas as pd
import pytest

from vlsa_tpu.config import args_grid
from vlsa_tpu.runner import SAHandler, VLSAHandler

from test_runner_e2e import base_cfg, make_cohort, vlsa_cfg

pytestmark = pytest.mark.slow


def test_args_grid_order():
    cfg = {"a": [1, 2], "b": "x", "c": [0.1, 0.2]}
    grid = args_grid(cfg)
    assert len(grid) == 4
    assert all(g["b"] == "x" for g in grid)
    combos = {(g["a"], g["c"]) for g in grid}
    assert combos == {(1, 0.1), (1, 0.2), (2, 0.1), (2, 0.2)}


def test_sa_cox_end_to_end(tmp_path):
    table, split = make_cohort(tmp_path, n_patients=30)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "loss_type": "SurvPLE",
        "net_output_converter": None,
        "net_dims": "64-32-1",
        "evaluator": "Cox",
        "time_format": "origin",
        "epochs": 1,
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0


def test_sa_quantile_bins(tmp_path):
    table, split = make_cohort(tmp_path, n_patients=40)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({"time_format": "quantile", "epochs": 1})
    handler = SAHandler(cfg)
    assert handler.data_meta.label_format == "discrete_quantile"
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_sa_few_shot(tmp_path):
    table, split = make_cohort(tmp_path, n_patients=40)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({"num_shot": 2, "epochs": 1})
    handler = SAHandler(cfg)
    metrics = handler.exec()
    # the few-shot train set shrank to <= 2 per bin
    assert len(handler.uid["train"]) <= 2 * handler.data_meta.num_bins
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_vlsa_zero_shot(tmp_path):
    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({
        "num_shot": 0,  # zero-shot: training skipped (ref base_handler.py:270-273)
        "vlsa_img_encoder_name": "FeatMIL",
        "vlsa_img_encoder_pooling": "logit_top5",
        "save_path": str(tmp_path / "result-zs"),
    })
    handler = VLSAHandler(cfg)
    metrics = handler.exec()
    assert set(metrics.keys()) == {"test"}
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0


def test_vlsa_adapter_learner(tmp_path):
    """Adapter-style prompt learner (TaskRes over frozen prototype features)."""
    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({
        "save_path": str(tmp_path / "result-adapter"),
        # the template-prompt asset carries 4 ordinal class names, so the
        # adapter path requires time_bins == 4 (same constraint as the ref)
        "time_bins": 4,
        "vlsa_pmt_learner_name": "Adapter",
        "vlsa_pmt_learner_adapter_method": "TaskRes",
        "vlsa_pmt_learner_adapter_num_ranks": None,
        "vlsa_pmt_learner_adapter_res_ratio": 0.5,
        "vlsa_pmt_learner_adapter_init_prompt_path":
            "vlsa_tpu/assets/tools/survival_template_prompts.json",
        "vlsa_pmt_learner_adapter_init_prompt_rank_idx": 0,
        "vlsa_pmt_learner_adapter_init_prompt_context_idx": 0,
        "epochs": 1,
    })
    handler = VLSAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_exec_test_mode(tmp_path):
    """test=True path reloads a trained checkpoint and evaluates only."""
    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = base_cfg(tmp_path, table, split)
    cfg["epochs"] = 1
    SAHandler(dict(cfg)).exec()

    test_cfg = dict(cfg)
    test_cfg.update({
        "test": True,
        "test_load_path": cfg["save_path"],
        "test_save_path": str(tmp_path / "test-out"),
        "test_path": "test",
        "ckpt_for_eval": "last",
    })
    handler = SAHandler(test_cfg)
    metrics = handler.exec_test()
    assert "exec-test" in metrics
    assert np.isfinite(dict(metrics["exec-test"])["pred_loss"])


def test_sa_continuous_regression(tmp_path):
    """Continuous-time model: ratio labels + recon/rank losses + Reg evaluator
    (ref cfg semantics for ESAT-style baselines)."""
    table, split = make_cohort(tmp_path, n_patients=30)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "loss_type": "recon_loss-rank_loss",
        "loss_recon_loss_alpha": 0.0,
        "loss_rank_loss_gamma": 1.0,
        "net_output_converter": None,
        "net_dims": "64-32-1",
        "evaluator": "Reg",
        "time_format": "ratio",
        "epochs": 1,
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0
    assert np.isfinite(vals["pred_loss"])


def test_sa_deepattnmisl_cluster_mode(tmp_path):
    """Cluster data mode: per-patient cluster-id files drive DeepAttnMISL
    (ref sa_handler.py:182-200 isinstance dispatch)."""
    table, split = make_cohort(tmp_path, n_patients=24)
    cluster_dir = tmp_path / "clusters"
    os.makedirs(cluster_dir)
    # synthetic bags have deterministic sizes; write matching cluster ids
    from vlsa_tpu.data.io import synthetic_bag
    import pandas as pd
    df = pd.read_csv(table)
    rng = np.random.default_rng(0)
    for _, row in df.iterrows():
        bag = synthetic_bag(row["pathology_id"], "synthetic://N=96,D=64,seed=3")
        np.save(cluster_dir / f"{row['patient_id']}.npy",
                rng.integers(0, 4, size=bag.shape[0]).astype(np.int64))
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "data_mode": "cluster",
        "path_cluster": str(cluster_dir),
        "deepmil_network": "DeepAttnMISL",
        "deepmil_num_clusters": 4,
        "net_dims": "64-32-4",
        "epochs": 1,
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_sa_patchgcn_graph_mode(tmp_path):
    """Graph data mode end to end FROM reference-format artifacts: per-slide
    torch_geometric .pt graphs (ref dataset/PatchWSI.py:231-249) are converted
    by data/convert.py into the .npz store that drives PatchGCN
    (ref sa_handler.py:194-196 graph dispatch)."""
    import torch
    from vlsa_tpu.data.convert import (
        _install_tg_unpickle_stubs, convert_graph_dir)

    table, split = make_cohort(tmp_path, n_patients=16)
    pt_dir = tmp_path / "graphs_pt"
    os.makedirs(pt_dir)
    _install_tg_unpickle_stubs()
    import torch_geometric.data.data as tgd
    from vlsa_tpu.data.io import synthetic_bag
    import pandas as pd
    df = pd.read_csv(table)
    for _, row in df.iterrows():
        bag = synthetic_bag(row["pathology_id"], "synthetic://N=64,D=64,seed=3")
        n = bag.shape[0]
        src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
        dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
        g = tgd.Data.__new__(tgd.Data)
        g.__dict__.update({"x": torch.tensor(bag),
                           "edge_index": torch.tensor(np.stack([src, dst]))})
        torch.save(g, str(pt_dir / f"{row['pathology_id']}.pt"))
    graph_dir = tmp_path / "graphs"
    assert convert_graph_dir(str(pt_dir), str(graph_dir), verbose=False) == 16
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "data_mode": "graph",
        "path_patch": "synthetic://N=64,D=64,seed=3",
        "path_graph": str(graph_dir),
        "deepmil_network": "PatchGCN",
        "deepmil_num_layers": 2,
        "net_dims": "64-32-4",
        "epochs": 1,
        "bp_every_batch": 4,
        "min_bucket": 64,
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_vlsa_clip_api(tmp_path):
    """VLSA with the OpenAI-CLIP api: our from-scratch BPE tokenizer + CLIP
    text tower drive the same pipeline."""
    table, split = make_cohort(tmp_path, n_patients=20)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({
        "save_path": str(tmp_path / "result-clip"),
        "vlsa_api": "CLIP",
        "vlsa_txt_encoder_name": "ViT-B/16",
        "_test_tower_overrides": {"width": 32, "heads": 4, "layers": 2,
                                  "output_dim": 64, "context_length": 64},
        "epochs": 1,
    })
    handler = VLSAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_vlsa_hf_api(tmp_path):
    """VLSA with the HuggingFace-CLIP api: offline-exported CLIPTokenizer +
    HF tower (causal + pad key mask, QuickGELU)."""
    from vlsa_tpu.models.hf_export import export_hf_clip_tokenizer

    tok_dir = tmp_path / "clip-tok" / "hfclip"
    export_hf_clip_tokenizer(str(tok_dir))

    table, split = make_cohort(tmp_path, n_patients=20)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({
        "save_path": str(tmp_path / "result-hf"),
        "vlsa_api": "HF",
        "path_clip_model": str(tmp_path / "clip-tok"),
        "vlsa_txt_encoder_name": "hfclip",
        "_test_tower_overrides": {"width": 32, "heads": 4, "layers": 2,
                                  "output_dim": 64, "context_length": 77},
        "epochs": 1,
    })
    handler = VLSAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])


def test_sa_hazard_mle(tmp_path):
    """Hazard-head variant: sigmoid converter + SurvMLE + NLL evaluator."""
    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "loss_type": "SurvMLE",
        "loss_survmle_alpha": 0.0,
        "net_output_converter": "sigmoid",
        "evaluator": "NLL",
        "epochs": 1,
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0
    assert np.isfinite(vals["pred_loss"])


def test_load_vlsa_from_run(tmp_path):
    """Round-trip: train a VLSA run, reload it from the run dir only
    (ref utils/model_inference.py:11-21), verify identical incidence."""
    import jax
    import jax.numpy as jnp
    from vlsa_tpu.interpret import load_vlsa_from_run

    table, split = make_cohort(tmp_path)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg["epochs"] = 1
    h = VLSAHandler(cfg)
    h.exec()

    module, params, loaded_cfg = load_vlsa_from_run(
        cfg["save_path"], ckpt_type="last", return_cfg=True)
    assert loaded_cfg["task"] == "vlsa"
    X = np.random.default_rng(0).normal(size=(1, 96, 64)).astype(np.float32)
    mask = jnp.ones((1, 96), bool)
    logits1, _, _ = module.apply({"params": params}, jnp.asarray(X), mask)
    logits2, _, _ = h.model.apply({"params": h.params}, jnp.asarray(X), mask)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               rtol=1e-5, atol=1e-6)


def test_vlsa_hf_api(tmp_path):
    """VLSA with the HF-CLIP api end to end (VERDICT r1 weak#6 /
    ROADMAP item 5): hf_export materialises an offline AutoTokenizer dir
    from the bundled BPE assets, and the HF tower trains through the full
    runner (ref model/utils_vl.py:30-36 HF path)."""
    from vlsa_tpu.models.hf_export import export_hf_clip_tokenizer

    tok_dir = export_hf_clip_tokenizer(str(tmp_path / "hf_tok"))
    table, split = make_cohort(tmp_path, n_patients=20)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({
        "save_path": str(tmp_path / "result-hf"),
        "vlsa_api": "HF",
        "vlsa_txt_encoder_name": "",
        "path_clip_model": tok_dir,
        "_test_tower_overrides": {"width": 32, "heads": 4, "layers": 2,
                                  "output_dim": 64, "context_length": 64},
        "epochs": 1,
    })
    handler = VLSAHandler(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_c_index"] <= 1.0
    assert np.isfinite(vals["pred_loss"])


def test_auto_resume_restart(tmp_path):
    """Elastic restart idempotence (SURVEY.md §5): a re-launched run with
    auto_resume picks up from the last per-epoch checkpoint instead of
    starting over."""
    import jax
    table, split = make_cohort(tmp_path, n_patients=16)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({"auto_resume": True, "epochs": 1, "bp_every_batch": 8})
    h1 = SAHandler(dict(cfg))
    h1.exec()
    p_after_1 = jax.tree.map(np.asarray, h1.params)

    # "restart" with a higher epoch budget: must resume at epoch 1, not 0
    cfg2 = dict(cfg, epochs=3)
    h2 = SAHandler(cfg2)
    h2.exec()
    # resumed params at epoch 1 equal the first run's output, then training
    # continued (params changed by epochs 2-3)
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_after_1), jax.tree.leaves(h2.params)))
    assert changed
    from vlsa_tpu.runner.ckpt import load_checkpoint
    ck = load_checkpoint(os.path.join(cfg["save_path"], "train_model-last.ckpt"))
    assert ck["epoch"] == 3


def test_sa_early_stop_lrs_best_ckpt(tmp_path):
    """es + lrs + ckpt_for_eval=best through the production runner: training
    stops before cfg['epochs'], the plateau scheduler reduces the LR, the
    best checkpoint exists and eval-all reports bestckpt metrics
    (ref runner/base_handler.py:188-201,418-427,641-667)."""
    import os

    table, split = make_cohort(tmp_path, n_patients=30)
    # the monitor needs a REAL validation split (2-column train/val splits
    # map val->test, leaving val_loader None — reference semantics, ref
    # base_handler.py:275-276); rewrite as 3-column train/val/test
    df = pd.read_csv(split)
    pids = list(df["train"].dropna()) + list(df["val"].dropna())
    n = len(pids)
    pd.DataFrame({
        "train": pd.Series(pids[:n - 12]),
        "val": pd.Series(pids[n - 12:n - 6]),
        "test": pd.Series(pids[n - 6:]),
    }).to_csv(split, index=False)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({
        "epochs": 30,
        "opt_lr": 0.5,            # diverges -> loss plateaus immediately
        "es": True, "es_warmup": 0, "es_patience": 2, "es_start_epoch": 0,
        "es_verbose": False, "monitor_metrics": "loss",
        "lrs": True, "lrs_factor": 0.5, "lrs_patience": 1,
        "ckpt_for_eval": "best",
        "eval_training_loader_per_epoch": True,  # exercises the eval-train loader
    })
    handler = SAHandler(cfg)
    metrics = handler.exec()
    assert handler.es is not None and handler.es.early_stop
    assert handler.steplr is not None and handler.steplr.lr < cfg["opt_lr"]
    save = cfg["save_path"]
    names = os.listdir(save)
    assert any("model-best" in n for n in names), names
    assert any("metrics-best" in n for n in names), names
    vals = dict(metrics["test"])
    assert np.isfinite(vals["pred_loss"])


def test_force_skip_training(tmp_path):
    """force_to_skip_training evaluates the (untrained) model without a
    checkpoint on disk (ref base_handler.py:270-273 skip branch)."""
    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = base_cfg(tmp_path, table, split)
    cfg["force_to_skip_training"] = True
    metrics = SAHandler(cfg).exec()
    vals = dict(metrics["test"])
    assert np.isfinite(vals["pred_loss"])
