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


def random_mask_instance(bag: np.ndarray, mask_ratio: float, scale: int = 1,
                         mask_way: str = "mask_zero") -> np.ndarray:
    """Random instance masking for robustness experiments
    (ref utils/func.py:50-76)."""
    if mask_ratio <= 0 or mask_ratio > 1:
        return bag
    N = bag.shape[0]
    n_square = scale * scale
    assert N % n_square == 0, "bag must consist of square instances."
    N_scaled = N // n_square
    n_keep = max(1, int(N_scaled * (1 - mask_ratio)))
    idxs = np.random.permutation(N_scaled)
    idxs_keep = np.sort(idxs[:n_keep])
    idxs_keep = (idxs_keep.reshape(-1, 1) * n_square
                 + np.arange(n_square).reshape(1, -1)).reshape(-1)
    if mask_way == "discard":
        return bag[idxs_keep]
    if mask_way == "mask_zero":
        new_bag = np.zeros_like(bag)
        new_bag[idxs_keep] = bag[idxs_keep]
        return new_bag
    raise NotImplementedError(f"mask_way={mask_way}")


class ClfBagDataset:
    """Slide-level bags with class labels (ref dataset/PatchWSI.py:18-144,
    'patch' mode) with instance masking + label-corruption experiments."""

    def __init__(self, patient_ids: List[str], patch_path: str, table_path: str,
                 read_format: str = "pt", ratio_mask=None,
                 aug_path_choices=None, ratio_sampling=None):
        if ratio_sampling is not None:
            from vlsa_tpu.data.bags import sampling_data
            print(f"[dataset] patient-level sampling with ratio_sampling = {ratio_sampling}")
            patient_ids, left = sampling_data(list(patient_ids), ratio_sampling)
            print(f"[dataset] sampled {len(patient_ids)} patients, left {len(left)}")
        df = pd.read_csv(table_path, dtype={"patient_id": str})
        for c in ("patient_id", "pathology_id", "label"):
            assert c in df.columns
        df = df[df["patient_id"].isin(set(patient_ids))]
        self.sids = list(df["pathology_id"])
        self.sid2label = dict(zip(df["pathology_id"], df["label"]))
        self.uid = self.sids
        self.read_path = patch_path
        self.read_format = read_format
        self.ratio_mask = ratio_mask
        self.new_sid2label = None
        self.flag_use_corrupted_label = False
        # slide-level feature augmentation: with p=0.5 read the original
        # feature directory, else one of two alternates whose name replaces
        # the second-to-last path segment (ref dataset/PatchWSI.py:89-105)
        self.aug_path_choices = aug_path_choices

    def corrupt_labels(self, corrupt_prob: float):
        """Random-label corruption experiment (ref PatchWSI.py:124-139)."""
        labels = np.array([self.sid2label[s] for s in self.sids])
        mask = np.random.rand(len(labels)) <= corrupt_prob
        labels[mask] = np.random.choice(labels.max() + 1, mask.sum())
        cnt = 0
        self.new_sid2label = {}
        for i, sid in enumerate(self.sids):
            if labels[i] != self.sid2label[sid]:
                cnt += 1
            self.new_sid2label[sid] = int(labels[i])
        self.flag_use_corrupted_label = True
        print(f"[dataset] {cnt / len(labels) * 100:.2f}% corrupted labels "
              f"with corrupt_prob = {corrupt_prob}")

    def resume_labels(self):
        if self.flag_use_corrupted_label:
            self.flag_use_corrupted_label = False
            print("[dataset] the corrupted labels have been resumed.")

    def __len__(self):
        return len(self.sids)

    def __getitem__(self, index):
        sid = self.sids[index]
        read_path = self.read_path
        if self.aug_path_choices:
            prob = np.random.rand()
            if prob > 0.5:
                choice = self.aug_path_choices[0 if prob <= 0.75 else 1]
                parts = str(read_path).split("/")
                parts[-2] = choice
                read_path = "/".join(parts)
        if str(read_path).startswith(SYNTHETIC_PREFIX):
            feats = synthetic_bag(sid, read_path)
        else:
            feats = read_patch_data(
                osp.join(read_path, sid + "." + self.read_format)
            ).astype(np.float32)
        if self.ratio_mask:
            feats = random_mask_instance(feats, self.ratio_mask)
        lab = (self.new_sid2label[sid] if self.flag_use_corrupted_label
               else self.sid2label[sid])
        label = np.asarray([float(lab), 0.0], np.float32)
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
        ratio_mask = cfg.get("ratio_mask") if cfg.get("test") else None
        # train-time slide-level feature augmentation by path switching
        # (ref dataset/PatchWSI.py:44-45,89-105; cfg key `random_patch_path`)
        aug = None
        if set_name == "train" and cfg.get("random_patch_path"):
            aug = cfg.get("patch_path_choices",
                          ["feat-x20-RN50-B-color_norm-vflip",
                           "feat-x20-RN50-B-color_hed_light"])
        return ClfBagDataset(patient_ids, cfg["path_patch"], cfg["path_table"],
                             read_format=cfg["feat_format"], ratio_mask=ratio_mask,
                             aug_path_choices=aug)

    def _finalize_cltor(self, cltor):
        cltor = dict(cltor)
        cltor["y"] = np.asarray(cltor["y"])[:, 0]
        return cltor

    def save_prediction_results(self, data_cltor, path_to_save, **kws):
        y = np.asarray(data_cltor["y"])
        save_prediction_clf(data_cltor["uid"], y, np.asarray(data_cltor["y_hat"]),
                            path_to_save,
                            binary=np.asarray(data_cltor["y_hat"]).shape[-1] == 2)
