"""Host-side IO: patch-feature bags, prompt assets, prediction CSVs.

Ref behaviour: utils/io.py.  Feature files may be .pt (torch, read on CPU),
.h5, or .npy; everything is returned as numpy float32 for the device
pipeline.  A `synthetic://N=<n>,D=<d>[,seed=<s>]` patch path generates
deterministic random bags so the full runner / benchmark can execute without
the (non-redistributable) TCGA feature blobs.
"""
from __future__ import annotations

import hashlib
import json
import os.path as osp
import re
from typing import Optional

import numpy as np

SYNTHETIC_PREFIX = "synthetic://"


def _synthetic_params(path: str) -> dict:
    spec = path[len(SYNTHETIC_PREFIX):]
    params = {"N": 1024, "D": 512, "seed": 0, "jitter": 1}
    for part in spec.split(","):
        if not part:
            continue
        k, v = part.split("=")
        params[k] = int(v)
    return params


def synthetic_bag(uid: str, path: str) -> np.ndarray:
    """Deterministic random bag keyed by (uid, path spec)."""
    p = _synthetic_params(path)
    h = int(hashlib.sha1(uid.encode()).hexdigest()[:8], 16)
    rng = np.random.default_rng(p["seed"] * 1000003 + h)
    n = p["N"]
    if p.get("jitter", 1):
        n = max(8, int(n * rng.uniform(0.5, 1.5)))
    return rng.normal(size=(n, p["D"])).astype(np.float32)


class QuantizedFeats:
    """Pre-quantized int8 patch features with per-patch sidecars.

    Produced by `data.convert --dtype int8` stores (`{sid}.q8npz`): `q` int8
    [N, D], `scale` f32 [N] (dequant), `inv` f32 [N] (1/||q||).  The batcher
    assembles these directly into int8 device batches — no per-epoch host
    quantization or norm pass (data/pipeline.py), a quarter of f32's disk
    and HBM bytes.  No reference counterpart (the reference streams f32
    torch tensors, ref utils/io.py:16-42)."""

    __slots__ = ("q", "scale", "inv")

    def __init__(self, q: np.ndarray, scale: np.ndarray, inv: np.ndarray):
        self.q = q
        self.scale = scale
        self.inv = inv

    @property
    def shape(self):
        return self.q.shape

    def dequantize(self) -> np.ndarray:
        return self.q.astype(np.float32) * self.scale[..., None]

    @staticmethod
    def concatenate(parts: "list[QuantizedFeats]") -> "QuantizedFeats":
        return QuantizedFeats(
            np.concatenate([p.q for p in parts], axis=0),
            np.concatenate([p.scale for p in parts], axis=0),
            np.concatenate([p.inv for p in parts], axis=0))


def read_quantized_feats(path: str) -> QuantizedFeats:
    z = np.load(path)
    return QuantizedFeats(z["q"], z["scale"], z["inv"])


def read_patch_data(path: str, dtype: str = "numpy", key: str = "features") -> np.ndarray:
    """Read one slide's patch features (ref utils/io.py:16-42)."""
    assert dtype in ("numpy",), "TPU pipeline is numpy-only"
    ext = osp.splitext(path)[1]
    if ext == ".q8npz":
        return read_quantized_feats(path).dequantize()
    if ext == ".h5":
        import h5py
        with h5py.File(path, "r") as hf:
            return np.asarray(hf[key][:])
    if ext == ".pt":
        import torch  # CPU-only torch is used purely as a .pt reader
        data = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(data, dict) and key in data:
            data = data[key]
        return data.numpy() if hasattr(data, "numpy") else np.asarray(data)
    if ext == ".npy":
        return np.load(path)
    raise ValueError(f"Not support {ext}")


def read_patch_feats_from_uid(uid: str, cfg: dict) -> np.ndarray:
    path_patch = cfg["path_patch"]
    if str(path_patch).startswith(SYNTHETIC_PREFIX):
        return synthetic_bag(uid, path_patch)
    full_path = osp.join(path_patch, uid + "." + cfg["feat_format"])
    return read_patch_data(full_path).astype(np.float32)


def read_patch_coord(path: str) -> np.ndarray:
    import h5py
    with h5py.File(path, "r") as hf:
        return np.asarray(hf["coords"][:])


def load_init_prompt(prompt_path, context_idx=0, rank_idx=0, replace=False):
    """Load context template + per-class rank names (ref utils/io.py:151-173)."""
    if prompt_path is None:
        return None, None
    with open(prompt_path, "r") as f:
        prompts = json.load(f)
    prompt_context = prompts["context_templates"][context_idx]
    prompt_rank_names = []
    for k in prompts["class_names"].keys():
        rank_name = prompts["class_names"][k][rank_idx]
        if replace:
            rank_name = prompt_context.replace("CLASSNAME", rank_name)
        prompt_rank_names.append(rank_name)
    return prompt_context, prompt_rank_names


def load_init_text(path, key=None):
    with open(path, "r") as f:
        texts = json.load(f)
    return texts if key is None else texts[str(key)]


def save_prediction_surv(patient_id, y_true, y_pred, save_path, **kws):
    """Survival prediction CSV: risk = sum(survival) + per-bin curves
    (ref utils/io.py:352-387)."""
    import pandas as pd
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    assert len(patient_id) == len(y_true) == len(y_pred)
    if y_pred.ndim == 2 and y_pred.shape[1] == 1:
        y_pred = np.squeeze(y_pred)
        t, e = y_true[:, 0], y_true[:, 1]
        df = pd.DataFrame({"patient_id": patient_id, "t": t, "e": e, "pred": y_pred},
                          columns=["patient_id", "t", "e", "pred"])
    else:
        bins = y_pred.shape[1]
        y_t, y_e = y_true[:, [0]], y_true[:, [1]]
        if "type_pred" in kws and ("IF" in str(kws["type_pred"]) or kws["type_pred"] == "incidence"):
            survival = 1.0 - np.cumsum(y_pred, axis=1)
        else:
            survival = np.cumprod(1.0 - y_pred, axis=1)
        risk = np.sum(survival, axis=1, keepdims=True)
        arr = np.concatenate((y_t, y_e, risk, survival), axis=1)
        df = pd.DataFrame(arr, columns=["t", "e", "risk"] + [f"surf_{i+1}" for i in range(bins)])
        df.insert(0, "patient_id", patient_id)
    df.to_csv(save_path, index=False)


def save_prediction_clf(uids, y_true, y_pred, save_path, binary=True, **kws):
    """Classification prediction CSV (ref utils/io.py:246-276)."""
    import pandas as pd
    y_true = np.squeeze(np.asarray(y_true))
    y_pred = np.asarray(y_pred)
    assert ((y_pred >= 0.0) & (y_pred <= 1.0)).all(), "Prediction must be probabilities."
    save_data = {"uids": uids, "y": y_true}
    cols = ["uids", "y"]
    if binary:
        save_data["y_hat"] = y_pred[:, 1]
        cols.append("y_hat")
    else:
        for i in range(y_pred.shape[-1]):
            save_data[f"y_hat_{i}"] = y_pred[:, i]
            cols.append(f"y_hat_{i}")
    pd.DataFrame(save_data, columns=cols).to_csv(save_path, index=False)
