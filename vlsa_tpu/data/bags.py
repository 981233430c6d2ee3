"""Patient-level bag datasets (host side).

Behavioural port of ref dataset/PatchWSI.py WSIPatchSurv/FewShot_WSIPatchSurv:
each item concatenates the patch features of every slide of a patient into one
`[N, D]` bag with labels `(t, e)`; the few-shot wrapper samples `num_shot`
patients per KM-de-censored time bin with a validity re-draw loop.

Unlike the reference (torch Dataset + DataLoader worker processes), bags are
plain numpy and batching/padding/prefetch live in `pipeline.py`.
"""
from __future__ import annotations

import os.path as osp
from typing import List, Optional

import numpy as np

from .io import (SYNTHETIC_PREFIX, QuantizedFeats, read_patch_data,
                 read_quantized_feats, synthetic_bag)
from .label_converter import MetaSurvData, calculate_uncensored_time_bins


class SurvBagDataset:
    """ref dataset/PatchWSI.py:147-253 ('patch' mode; cluster/graph extras are
    returned as aux arrays when configured)."""

    def __init__(self, patient_ids: List[str], patch_path: str, mode: str,
                 meta_data: MetaSurvData, read_format: str = "pt", **kws):
        assert mode in ("patch", "cluster", "graph")
        self.mode = mode
        self.kws = kws
        self.read_path = patch_path
        self.read_format = read_format
        self.pids, self.pid2sids, self.pid2label = meta_data.collect_info_by_pids(patient_ids)
        self.meta_data = meta_data
        self.uid = self.pids

    def get_meta_data(self):
        return self.meta_data

    def __len__(self):
        return len(self.pids)

    def _load_feats(self, sids) -> np.ndarray:
        feats = []
        quantized = self.read_format == "q8npz"
        for sid in sids:
            if str(self.read_path).startswith(SYNTHETIC_PREFIX):
                feats.append(synthetic_bag(sid, self.read_path))
                continue
            full_path = osp.join(self.read_path, sid + "." + self.read_format)
            if not osp.exists(full_path):
                print(f"[SurvBagDataset] warning: not found slide {sid}.")
                continue
            if quantized:
                # pre-quantized int8 store: int8 + per-patch sidecars flow to
                # the batcher as-is (no host dequant/quant per epoch)
                feats.append(read_quantized_feats(full_path))
            else:
                feats.append(read_patch_data(full_path).astype(np.float32))
        if feats and isinstance(feats[0], QuantizedFeats):
            return QuantizedFeats.concatenate(feats)
        return np.concatenate(feats, axis=0)

    def _slide_len(self, sid: str) -> int:
        if str(self.read_path).startswith(SYNTHETIC_PREFIX):
            return synthetic_bag(sid, self.read_path).shape[0]
        full_path = osp.join(self.read_path, sid + "." + self.read_format)
        if not osp.exists(full_path):
            return 0
        if self.read_format == "npy":
            try:
                from .native_loader import native_available, read_npy_info
                if native_available():
                    return read_npy_info(full_path)[0]
            except Exception:
                pass
        if self.read_format == "q8npz":
            return np.load(full_path)["scale"].shape[0]
        return read_patch_data(full_path).shape[0]

    def bag_paths(self, index: int):
        """Per-bag file list for the native loader — .npy f32 stores or
        .q8npz pre-quantized stores (None when the store is not
        native-readable)."""
        if (self.mode != "patch"  # cluster/graph aux arrays need the numpy path
                or self.read_format not in ("npy", "q8npz")
                or str(self.read_path).startswith(SYNTHETIC_PREFIX)):
            return None
        pid = self.pids[index]
        return [osp.join(self.read_path, sid + "." + self.read_format)
                for sid in self.pid2sids[pid]]

    def bag_label(self, index: int):
        return np.asarray(self.pid2label[self.pids[index]], dtype=np.float32)

    def __getitem__(self, index: int):
        pid = self.pids[index]
        sids = self.pid2sids[pid]
        label = np.asarray(self.pid2label[pid], dtype=np.float32)
        feats = self._load_feats(sids)
        if self.mode == "cluster":
            cids = np.load(osp.join(self.kws["cluster_path"], f"{pid}.npy"))
            assert cids.shape[0] == feats.shape[0]
            return index, (feats, cids), label
        if self.mode == "graph":
            # per-slide adjacency as .npz {edge_index [2, E]} (TPU-friendly
            # replacement of the reference's torch_geometric .pt graphs,
            # ref dataset/PatchWSI.py:231-249); slide graphs are offset and
            # concatenated like the features
            edges = []
            offset = 0
            for sid in sids:
                gp = osp.join(self.kws["graph_path"], sid + ".npz")
                ei = np.load(gp)["edge_index"].astype(np.int64)
                edges.append(ei + offset)
                n_sid = ei.max() + 1 if ei.size else 0
                offset = feats.shape[0]  # conservative: offset by total-so-far
            edge_index = np.concatenate(edges, axis=1) if edges else                 np.zeros((2, 0), np.int64)
            return index, (feats, edge_index), label
        return index, (feats, np.zeros(1, np.float32)), label


class FewShotSurvBagDataset:
    """Few-shot wrapper (ref dataset/PatchWSI.py:256-317)."""

    def __init__(self, dataset: SurvBagDataset, num_shot: int, seed: int = 0):
        self._dataset = dataset
        self.num_shot = num_shot
        self.seed = seed
        self.meta_data = dataset.meta_data
        self.uncensored_time_bins = calculate_uncensored_time_bins(
            dataset.uid, self.meta_data, ret_continuous_time=False)
        event_labels = [dataset.pid2label[u][1] for u in dataset.uid]
        self.few_shot_idx = self.get_few_shot_samples(
            self.uncensored_time_bins, event_labels, seed=seed)
        self.uid = [dataset.uid[i] for i in self.few_shot_idx]
        self.pid2label = dataset.pid2label

    def get_few_shot_samples(self, discrete_time_labels, event_labels,
                             preserve_order=True, seed=0):
        discrete_time_labels = np.asarray(discrete_time_labels)
        event_labels = np.asarray(event_labels)
        time_bins = np.arange(self.meta_data.num_bins)
        rng = np.random.default_rng(seed)
        is_valid = False
        few_shot_idx: List[int] = []
        while not is_valid:
            few_shot_idx = []
            for t in time_bins:
                idx_of_t = np.where(discrete_time_labels == t)[0]
                if self.num_shot <= 0:
                    few_shot_idx += idx_of_t.tolist()
                else:
                    num_sample = min(self.num_shot, len(idx_of_t))
                    few_shot_idx += rng.choice(idx_of_t, num_sample, replace=False).tolist()
            cnt_event = event_labels[few_shot_idx].sum()
            is_valid = cnt_event >= 1 and cnt_event < len(few_shot_idx)
        if preserve_order:
            few_shot_idx.sort()
        return few_shot_idx

    def get_meta_data(self):
        return self.meta_data

    def __len__(self):
        return len(self.few_shot_idx)

    def __getitem__(self, index: int):
        return self._dataset[self.few_shot_idx[index]]


def sampling_data(data, num):
    """Random patient subsampling (ref utils/func.py:109-121): float in (0,1)
    = fraction, int = count.  Returns (sampled, left)."""
    total = len(data)
    if isinstance(num, float):
        assert 0.0 < num < 1.0
        num = int(total * num)
    assert num < total
    idxs = np.random.permutation(total)
    return ([data[i] for i in idxs[:num]], [data[i] for i in idxs[num:]])


def prepare_surv_dataset(patient_ids: List[str], cfg: dict, **kws):
    """ref dataset/utils.py:46-74."""
    assert "meta_data" in kws, "The argument `meta_data` must be specified."
    ratio_sampling = kws.get("ratio_sampling")  # programmatic only, like the ref
    if ratio_sampling is not None:
        print(f"[dataset] patient-level sampling with ratio_sampling = {ratio_sampling}")
        patient_ids, pid_left = sampling_data(patient_ids, ratio_sampling)
        print(f"[dataset] sampled {len(patient_ids)} patients, "
              f"left {len(pid_left)} patients")
    dataset = SurvBagDataset(
        patient_ids, cfg["path_patch"], cfg["data_mode"], kws["meta_data"],
        read_format=cfg["feat_format"],
        cluster_path=cfg.get("path_cluster"),
        coord_path=cfg.get("path_coord"),
        graph_path=cfg.get("path_graph"),
    )
    if kws.get("num_shot", -1) and kws.get("num_shot", -1) > 0:
        seed = kws.get("seed_shot", 42)
        dataset = FewShotSurvBagDataset(dataset, kws["num_shot"], seed)
    return dataset
