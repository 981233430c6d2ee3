"""CLF handler: slide-level classification (ref BaseHandler's clf task,
runner/base_handler.py:203-225 + dataset/PatchWSI.py:18-144)."""
from __future__ import annotations

import os.path as osp
from typing import List

import numpy as np
import pandas as pd

from ..config import fetch_kws, parse_str_dims
from ..data.io import SYNTHETIC_PREFIX, read_patch_data, save_prediction_clf, synthetic_bag
from ..eval import load_evaluator
from ..models import load_model
from .base import BaseHandler


class ClfBagDataset:
    """Slide-level bags with class labels (ref dataset/PatchWSI.py:18-122,
    'patch' mode; slide-level augmentation/corruption experiments omitted)."""

    def __init__(self, patient_ids: List[str], patch_path: str, table_path: str,
                 read_format: str = "pt"):
        df = pd.read_csv(table_path, dtype={"patient_id": str})
        for c in ("patient_id", "pathology_id", "label"):
            assert c in df.columns
        df = df[df["patient_id"].isin(set(patient_ids))]
        self.sids = list(df["pathology_id"])
        self.sid2label = dict(zip(df["pathology_id"], df["label"]))
        self.uid = self.sids
        self.read_path = patch_path
        self.read_format = read_format

    def __len__(self):
        return len(self.sids)

    def __getitem__(self, index):
        sid = self.sids[index]
        if str(self.read_path).startswith(SYNTHETIC_PREFIX):
            feats = synthetic_bag(sid, self.read_path)
        else:
            feats = read_patch_data(
                osp.join(self.read_path, sid + "." + self.read_format)
            ).astype(np.float32)
        label = np.asarray([float(self.sid2label[sid]), 0.0], np.float32)
        return index, (feats, np.zeros(1, np.float32)), label


class CLFHandler(BaseHandler):
    uses_vl = False

    def __init__(self, cfg):
        assert cfg["task"] == "clf", f"Expected task = `clf` but got {cfg['task']}."
        super().__init__(cfg)

    def func_load_model(self, cfg):
        dims = parse_str_dims(cfg["net_dims"])
        arch_cfg = fetch_kws(cfg, prefix=cfg["arch"].lower())
        module, params = load_model(cfg["arch"], dims, rng=self.rng, **arch_cfg)
        return module, params, {}

    def func_build_engine(self, cfg):
        from .engine import TrainEngine, make_output_converter
        converter = make_output_converter(cfg.get("net_output_converter"))
        loss_fns, weights = self.loss, self.loss_weight

        def objective(raw, t, e, sample_mask, logit_scale=None, query_div_fn=None):
            total = 0.0
            for name, fn in loss_fns.items():
                # classification losses take (logits, label); padded rows are
                # valid=0 and excluded by re-weighting
                w = weights.get(name, 1)
                per = fn(raw, t.astype(np.int32) if hasattr(t, "astype") else t,
                         ret_mean=False)
                if per.ndim > 1:
                    per = per.mean(axis=-1)
                total += w * (per * sample_mask).sum() / sample_mask.sum().clip(1.0)
            return total

        return TrainEngine(self.model, self.tx, objective, uses_vl=False)

    def func_load_evaluator(self, cfg, meta_data=None):
        assert cfg["evaluator"] in ("Binary", "Multi-class")
        evaluator = load_evaluator("clf", cfg["evaluator"])
        if cfg["evaluator"] == "Binary":
            metrics_list = ["auc", "loss", "acc", "acc@mid", "acc_best",
                            "recall", "precision", "f1_score", "ece", "mce"]
        else:
            metrics_list = ["auc", "loss", "acc", "macro_f1_score", "micro_f1_score"]
        return evaluator, metrics_list, ["auc", "loss"]

    def func_prepare_dataset(self, patient_ids, set_name, cfg, meta_data=None):
        return ClfBagDataset(patient_ids, cfg["path_patch"], cfg["path_table"],
                             read_format=cfg["feat_format"])

    def _finalize_cltor(self, cltor):
        cltor = dict(cltor)
        cltor["y"] = np.asarray(cltor["y"])[:, 0]
        return cltor

    def save_prediction_results(self, data_cltor, path_to_save, **kws):
        y = np.asarray(data_cltor["y"])
        save_prediction_clf(data_cltor["uid"], y, np.asarray(data_cltor["y_hat"]),
                            path_to_save,
                            binary=np.asarray(data_cltor["y_hat"]).shape[-1] == 2)
