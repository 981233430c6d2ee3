"""CLF handler end-to-end on a synthetic binary slide-classification cohort."""
import numpy as np
import pandas as pd

from vlsa_tpu.runner import CLFHandler
import pytest

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(9)


def make_clf_cohort(tmp_path, n=40):
    rows = []
    for i in range(n):
        pid = f"P{i:03d}"
        rows.append({"patient_id": pid, "pathology_id": pid + "-s",
                     "label": int(RNG.random() < 0.5)})
    table = tmp_path / "clf.csv"
    pd.DataFrame(rows).to_csv(table, index=False)
    pids = [r["patient_id"] for r in rows]
    split = tmp_path / "splits.csv"
    pd.DataFrame({"train": pd.Series(pids[:28]), "val": pd.Series(pids[28:])}
                 ).to_csv(split, index=False)
    return str(table), str(split)


def test_clf_end_to_end(tmp_path):
    table, split = make_clf_cohort(tmp_path)
    cfg = {
        "task": "clf", "seed": 1, "save_path": str(tmp_path / "res"),
        "save_prediction": True, "ckpt_for_eval": "last", "num_shot": -1,
        "dataset_name": "tcga_test",
        "path_patch": "synthetic://N=64,D=32,seed=5",
        "path_table": table, "data_mode": "patch", "feat_format": "pt",
        "data_split_path": split, "data_split_seed": 0,
        "arch": "DeepMIL", "init_wt": False,
        "net_output_converter": "softmax", "net_dims": "32-16-2",
        "deepmil_network": "ABMIL", "deepmil_use_feat_proj": False,
        "loss_type": "CE", "loss_ce_smoothing": 0.1,
        "evaluator": "Binary",
        "opt_name": "adam", "opt_lr": 0.001, "opt_weight_decay": 0.0,
        "epochs": 2, "batch_size": 1, "bp_every_batch": 8,
        "es": False, "lrs": False, "test": False, "min_bucket": 64,
        "monitor_metrics": "loss",
    }
    handler = CLFHandler(cfg)
    metrics = handler.exec()
    vals = dict(metrics["test"])
    assert 0.0 <= vals["pred_auc"] <= 1.0
    assert np.isfinite(vals["pred_loss"])


def test_clf_aug_path_switching(tmp_path):
    """Slide-level augmentation path switching (ref PatchWSI.py:89-105):
    with aug_path_choices set, reads resolve to an alternate feature
    directory whose name replaces the second-to-last path segment."""
    import pandas as pd
    from vlsa_tpu.runner.clf import ClfBagDataset

    table = tmp_path / "table.csv"
    pd.DataFrame({"patient_id": ["p0"], "pathology_id": ["s0"],
                  "label": [1]}).to_csv(table, index=False)
    for i, sub in enumerate(("orig", "augA", "augB")):
        d = tmp_path / sub / "feats"
        d.mkdir(parents=True)
        np.save(d / "s0.npy", np.full((4, 8), float(i), np.float32))
    ds = ClfBagDataset(["p0"], str(tmp_path / "orig" / "feats"), str(table),
                       read_format="npy", aug_path_choices=["augA", "augB"])
    np.random.seed(0)
    vals = {float(np.asarray(ds[0][1][0])[0, 0]) for _ in range(60)}
    assert vals == {0.0, 1.0, 2.0}
