#!/usr/bin/env python
"""Task-level int8 accuracy validation (VERDICT r2 weak#1 / #2).

The int8 feature-storage fast path changes the numbers the model consumes
(per-patch symmetric quantization, a semantics change vs the reference's f32
features).  Kernel-level parity vs f32-on-the-same-dequantized-data is
covered by tests/test_int8.py; THIS script measures what int8 storage does
to the TASK metrics: it trains + evaluates the production runner twice on
the same synthetic cohort — once from a float32 `.npy` store, once from the
same features pre-quantized to a `.q8npz` store — for both the VLSA flagship
and the SA/ABMIL baseline, and reports

  * test C-index deviation |C_int8 - C_f32|,
  * mean / max absolute survival-curve deviation over the test predictions.

Results land in INT8_ACCURACY.json; bench.py attaches them to its
`int8_opt_in` block so the headline throughput carries accuracy evidence.
The synthetic cohort embeds a real prognostic signal (bag-mean shift along
a risk direction drives the event time), so the C-index is meaningfully
above 0.5 and the comparison is informative.

Round-4 extension (VERDICT r3 next#3): evidence proportional to the int8
headline's prominence — multiple independent seeds (cohort + init), a
long-bag (4096-patch) point, both loss families per seed, with the spread
(max deviation over all runs) reported alongside the per-run numbers.

Usage:
  python scripts/validate_int8.py --smoke           # small, CI tier (~2 min)
  python scripts/validate_int8.py                   # medium cohort, 1 seed
  python scripts/validate_int8.py --seeds 0,1,2 --patches 1024,4096
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

import numpy as np
import pandas as pd

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def make_cohort(root: str, n_patients: int, n_patches: int, dim: int,
                seed: int = 0):
    """Synthetic cohort with prognostic signal: bag mean shifted along a
    fixed risk direction; event time decreasing in risk."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(dim,))
    v /= np.linalg.norm(v)
    feat_dir = osp.join(root, "feats_f32")
    os.makedirs(feat_dir, exist_ok=True)
    rows = []
    for i in range(n_patients):
        pid = f"P{i:03d}"
        risk = float(rng.uniform(-1.0, 1.0))
        feats = (rng.normal(size=(n_patches, dim)) * 0.8
                 + risk * 1.2 * v).astype(np.float32)
        np.save(osp.join(feat_dir, f"{pid}-slide.npy"), feats)
        t = float(np.clip(60.0 * np.exp(-risk) * rng.lognormal(0, 0.25),
                          1.0, 200.0))
        e = int(rng.random() < 0.7)
        rows.append({"pathology_id": f"{pid}-slide", "patient_id": pid,
                     "e": e, "t": round(t, 2)})
    table = osp.join(root, "survival.csv")
    pd.DataFrame(rows).to_csv(table, index=False)
    pids = [r["patient_id"] for r in rows]
    n_train = int(n_patients * 0.6)
    n_val = int(n_patients * 0.2)
    split = osp.join(root, "splits_0.csv")
    pd.DataFrame({
        "train": pd.Series(pids[:n_train]),
        "val": pd.Series(pids[n_train:n_train + n_val]),
        "test": pd.Series(pids[n_train + n_val:]),
    }).to_csv(split, index=False)
    return table, split, feat_dir


def base_cfg(root, table, split, feat_dir, n_patches, dim, epochs, save):
    return {
        "task": "sa", "seed": 42, "wandb_prj": None,
        "save_path": osp.join(root, save), "save_prediction": True,
        "eval_training_loader_per_epoch": False, "ckpt_for_eval": "last",
        "num_shot": -1, "dataset_name": "tcga_synth",
        "path_patch": feat_dir, "path_coord": None, "path_table": table,
        "data_mode": "patch", "path_cluster": None, "path_graph": None,
        "feat_format": "npy", "time_format": "interval", "time_bins": None,
        "data_split_path": split, "data_split_seed": 0,
        "arch": "DeepMIL", "init_wt": False,
        "net_output_converter": "softmax", "net_dims": f"{dim}-128-4",
        "deepmil_network": "ABMIL", "deepmil_pooling": "attention",
        "deepmil_use_feat_proj": False, "deepmil_drop_rate": 0.0,
        "loss_type": "SurvIFMLE", "loss_survifmle_weight": 1.0,
        "evaluator": "NLL-IF",
        "opt_name": "adam", "opt_lr": 0.0005, "opt_weight_decay": 0.00001,
        "epochs": epochs, "batch_size": 1, "bp_every_batch": 8,
        "num_workers": 0, "min_bucket": min(n_patches, 256),
        "es": False, "monitor_metrics": "loss", "lrs": False, "test": False,
    }


def vlsa_cfg(cfg, dim, tower):
    cfg = dict(cfg)
    cfg.update({
        "task": "vlsa", "arch": "VLSA", "vlsa_api": "CONCH",
        "path_clip_model": None,
        "model_saver_module_filter": "prompt_encoder",
        "vlsa_frozen_logit_scale": False,
        "vlsa_img_encoder_name": "VLFAN",
        "vlsa_img_encoder_frozen": False,
        "vlsa_img_encoder_dim_in": dim,
        "vlsa_img_encoder_dim_hid": 128,
        "vlsa_img_encoder_use_feat_proj": False,
        "vlsa_img_encoder_drop_rate": 0.0,
        "vlsa_img_encoder_pred_head": "default",
        "vlsa_img_encoder_query": "Text",
        "vlsa_img_encoder_num_query": None,
        "vlsa_img_encoder_query_pooling": "mean",
        "vlsa_img_encoder_gated_query": False,
        "vlsa_img_encoder_query_text_method": "TaskRes",
        "vlsa_img_encoder_query_text_res_ratio": 0.5,
        "vlsa_img_encoder_query_text_load_path":
            "vlsa_tpu/assets/tools/survival_text_prototypes.json",
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
        "vlsa_pmt_learner_coop_init_prompt_path":
            "vlsa_tpu/assets/tools/survival_prompts.json",
        "vlsa_pmt_learner_coop_init_prompt_rank_idx": 0,
        "vlsa_pmt_learner_coop_init_prompt_context_idx": 0,
        "vlsa_pmt_learner_coop_rank_specific_context": False,
        "vlsa_pmt_learner_coop_frozen_context_embeds": False,
        "vlsa_pmt_learner_coop_frozen_rank_embeds": False,
        "loss_type": "SurvIFMLE-SurvEMD",
        "loss_survifmle_weight": 1.0,
        "loss_survemd_weight": 1.0, "loss_survemd_p": 2,
        "evaluator": "VL-IF",
        "_test_tower_overrides": tower,
    })
    return cfg


def run_once(cfg, handler_cls):
    handler = handler_cls(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    prefix = "vlsa" if cfg["task"] == "vlsa" else "sa"
    pred_csv = osp.join(cfg["save_path"],
                        f"{prefix}_train_last_pred_test.csv")
    df = pd.read_csv(pred_csv)
    surv = df[[c for c in df.columns if c.startswith("surf_")]].to_numpy()
    return float(vals["pred_c_index"]), surv, df["patient_id"].tolist()


def compare(root, cfg_f32, handler_cls, label):
    from vlsa_tpu.data.convert import convert_dir
    q8_dir = osp.join(root, f"feats_q8_{label}")
    if not osp.isdir(q8_dir):
        convert_dir(cfg_f32["path_patch"], q8_dir, dtype="int8", verbose=False)

    print(f"[int8-val] {label}: f32 run ...")
    c_f32, surv_f32, pids_f32 = run_once(cfg_f32, handler_cls)
    cfg_q8 = dict(cfg_f32)
    cfg_q8.update(path_patch=q8_dir, feat_format="q8npz",
                  feats_dtype="int8",
                  save_path=cfg_f32["save_path"] + "-int8")
    print(f"[int8-val] {label}: int8 run ...")
    c_q8, surv_q8, pids_q8 = run_once(cfg_q8, handler_cls)
    assert pids_f32 == pids_q8
    dev = np.abs(surv_f32 - surv_q8)
    res = {
        "c_index_f32": round(c_f32, 4),
        "c_index_int8": round(c_q8, 4),
        "c_index_abs_dev": round(abs(c_f32 - c_q8), 4),
        "survival_curve_mean_abs_dev": round(float(dev.mean()), 5),
        "survival_curve_max_abs_dev": round(float(dev.max()), 5),
        "n_test_patients": len(pids_f32),
    }
    print(f"[int8-val] {label}: {json.dumps(res)}")
    return res


def run_cell(root: str, seed: int, n_pat: int, n_patch: int, dim: int,
             epochs: int, tower: dict) -> dict:
    """One (seed, bag-length) cell: fresh cohort, SA + VLSA f32-vs-int8."""
    from vlsa_tpu.runner import SAHandler, VLSAHandler
    cell = osp.join(root, f"s{seed}_n{n_patch}")
    os.makedirs(cell, exist_ok=True)
    table, split, feat_dir = make_cohort(cell, n_pat, n_patch, dim, seed=seed)
    cfg_sa = base_cfg(cell, table, split, feat_dir, n_patch, dim, epochs,
                      "run-sa")
    cfg_sa["seed"] = 42 + seed  # vary init/shuffle with the cohort
    cfg_vl = vlsa_cfg(base_cfg(cell, table, split, feat_dir, n_patch, dim,
                               epochs, "run-vlsa"), dim, tower)
    cfg_vl["seed"] = 42 + seed
    return {
        "seed": seed, "patches_per_bag": n_patch,
        "sa_abmil": compare(cell, cfg_sa, SAHandler, "sa"),
        "vlsa": compare(cell, cfg_vl, VLSAHandler, "vlsa"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--patients", type=int, default=None)
    ap.add_argument("--patches", default=None,
                    help="comma list of bag lengths, e.g. 1024,4096")
    ap.add_argument("--seeds", default=None,
                    help="comma list of cohort/init seeds, e.g. 0,1,2")
    ap.add_argument("--cells", default=None,
                    help="explicit seed:patches pairs, e.g. "
                         "'0:1024,1:1024,2:1024,0:4096' (overrides "
                         "--seeds/--patches cross product)")
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=osp.join(REPO, "INT8_ACCURACY.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    n_pat = args.patients or (36 if args.smoke else 64)
    patch_list = [int(x) for x in args.patches.split(",")] if args.patches \
        else [256 if args.smoke else 1024]
    seed_list = [int(x) for x in args.seeds.split(",")] if args.seeds \
        else [0]
    dim = args.dim or (64 if args.smoke else 512)
    epochs = args.epochs or (2 if args.smoke else 4)
    tower = ({"width": 32, "heads": 4, "layers": 2, "output_dim": dim}
             if args.smoke else
             {"width": 64, "heads": 4, "layers": 4, "output_dim": dim})

    tmp = None
    root = args.workdir
    if root is None:
        tmp = tempfile.TemporaryDirectory(prefix="vlsa_int8_val_")
        root = tmp.name

    if args.cells:
        plan = [tuple(int(v) for v in c.split(":"))
                for c in args.cells.split(",")]
        patch_list = sorted({p for _, p in plan})
        seed_list = sorted({s for s, _ in plan})
    else:
        plan = [(s, p) for s in seed_list for p in patch_list]

    cells = []
    for seed, n_patch in plan:
        print(f"[int8-val] === seed={seed} patches={n_patch} ===")
        cells.append(run_cell(root, seed, n_pat, n_patch, dim, epochs,
                              tower))

    def agg(key, field):
        return [c[key][field] for c in cells]
    spread = {
        "c_index_abs_dev_max": max(max(agg("sa_abmil", "c_index_abs_dev")),
                                   max(agg("vlsa", "c_index_abs_dev"))),
        "c_index_abs_dev_all": {
            "sa_abmil": agg("sa_abmil", "c_index_abs_dev"),
            "vlsa": agg("vlsa", "c_index_abs_dev")},
        "surv_curve_max_abs_dev_max": max(
            max(agg("sa_abmil", "survival_curve_max_abs_dev")),
            max(agg("vlsa", "survival_curve_max_abs_dev"))),
        "n_cells": len(cells),
    }
    result = {
        "cohort": {"patients": n_pat, "patches_per_bag": patch_list,
                   "seeds": seed_list, "dim": dim,
                   "epochs": epochs, "smoke": bool(args.smoke)},
        "spread": spread,
        "cells": cells,
        # keep round-3 top-level keys pointing at the first cell so
        # bench.py's int8_opt_in attachment stays stable
        "sa_abmil": cells[0]["sa_abmil"],
        "vlsa": cells[0]["vlsa"],
        "note": ("production-runner A/B per (seed, bag-length) cell: fresh "
                 "synthetic cohort + init per seed, float32 .npy store vs "
                 "the same features pre-quantized to .q8npz (per-patch "
                 "symmetric int8); both loss families (SA/ABMIL IFMLE and "
                 "VLSA IFMLE+EMD); 'spread' aggregates max deviations over "
                 "all cells"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
