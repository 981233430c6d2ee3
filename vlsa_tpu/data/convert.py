"""Artifact converters: reference on-disk formats -> TPU-friendly stores.

* feature bags: torch `.pt` / `.h5` -> `.npy` (f32 or f16).  The reference
  stores CONCH features as torch `.pt` tensors (ref utils/io.py:16-42); on
  TPU hosts `.npy` is the friendlier format — the native loader
  (native/bagloader.cpp) reads it without Python or torch in the loop.
* WSI graphs: torch_geometric `Data` pickles consumed by the reference's
  PatchGCN path (ref dataset/PatchWSI.py:231-249, GraphBatchWSI.py:13-60)
  -> `.npz {edge_index, edge_latent?}` edge lists, readable without
  torch_geometric (which is not a dependency here) via unpickling stubs.
* DeepAttnMISL cluster files need no conversion: both the reference and this
  repo read `{pid}.npy` cluster-id arrays (ref dataset/PatchWSI.py:218).

Usage:
    python -m vlsa_tpu.data.convert --src <pt_dir> --dst <npy_dir> [--f16]
    python -m vlsa_tpu.data.convert --graphs --src <graph_pt_dir> --dst <npz_dir>
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import types

import numpy as np

from .io import read_patch_data


def convert_dir(src: str, dst: str, f16: bool = False, verbose: bool = True,
                dtype: str = None):
    """Feature-store conversion.  dtype:
      * None/'f32'/'f16' -> `{sid}.npy` (native-loader readable),
      * 'int8' -> `{sid}.q8npz` pre-quantized store {q int8 [N,D],
        scale f32 [N], inv f32 [N]} — per-patch symmetric quantization +
        1/l2norm sidecars computed ONCE here, so the training pipeline does
        no per-epoch host quantization (data/pipeline.py fast path; set
        `feat_format: q8npz`, `feats_dtype: int8`)."""
    from .pipeline import feats_inv_norms, quantize_feats_int8
    os.makedirs(dst, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(src)):
        stem, ext = osp.splitext(fname)
        if ext not in (".pt", ".h5", ".npy"):
            continue
        arr = read_patch_data(osp.join(src, fname))
        if dtype == "int8":
            q, scale = quantize_feats_int8(arr.astype(np.float32))
            inv = feats_inv_norms(q)
            # write through a file object: exact `{stem}.q8npz` name
            with open(osp.join(dst, stem + ".q8npz"), "wb") as f:
                np.savez(f, q=q, scale=scale, inv=inv)
        else:
            np.save(osp.join(dst, stem + ".npy"),
                    arr.astype(np.float16 if (f16 or dtype == "f16") else np.float32))
        n += 1
        if verbose and n % 100 == 0:
            print(f"[convert] {n} files...")
    if verbose:
        print(f"[convert] wrote {n} feature files to {dst}")
    return n


def _install_tg_unpickle_stubs():
    """Minimal class stubs so torch.load can unpickle torch_geometric `Data`
    objects without torch_geometric installed.  Covers both the PatchGCN-era
    tg1 layout (attributes directly in __dict__) and tg2 (`_store` holding a
    GlobalStorage with `_mapping`)."""
    existing = sys.modules.get("torch_geometric")
    if existing is not None and getattr(existing, "__file__", None):
        return  # real torch_geometric installed; stubs (no __file__) augment

    def mk(name):
        m = types.ModuleType(name)
        m.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]) \
            .ModuleSpec(name, None)
        m._vlsa_stub = True
        sys.modules[name] = m
        return m

    class _Plain:
        """Generic unpickle target: default object reduce restores __dict__."""

    tg = sys.modules.get("torch_geometric") or mk("torch_geometric")
    # keep the reference-import stubs working whatever the install order
    # (vlsa_tpu.utils.ref_stubs also fabricates torch_geometric.nn)
    nn_mod = sys.modules.get("torch_geometric.nn") or mk("torch_geometric.nn")
    for cls_name in ("GENConv", "DeepGCNLayer"):
        if not hasattr(nn_mod, cls_name):
            setattr(nn_mod, cls_name, type(cls_name, (), {}))
    tg.nn = nn_mod
    data_pkg = sys.modules.get("torch_geometric.data") or mk("torch_geometric.data")
    data_mod = sys.modules.get("torch_geometric.data.data") or mk("torch_geometric.data.data")
    storage_mod = sys.modules.get("torch_geometric.data.storage") or mk(
        "torch_geometric.data.storage")
    for cls_name in ("Data", "Batch", "DataEdgeAttr", "DataTensorAttr"):
        if not hasattr(data_mod, cls_name):
            cls = type(cls_name, (_Plain,), {"__module__": data_mod.__name__})
            setattr(data_mod, cls_name, cls)
        if not hasattr(data_pkg, cls_name):
            setattr(data_pkg, cls_name, getattr(data_mod, cls_name))
    for cls_name in ("GlobalStorage", "NodeStorage", "EdgeStorage", "BaseStorage"):
        if not hasattr(storage_mod, cls_name):
            cls = type(cls_name, (_Plain,), {"__module__": storage_mod.__name__})
            setattr(storage_mod, cls_name, cls)
    tg.data = data_pkg
    data_pkg.data = data_mod
    data_pkg.storage = storage_mod


def _extract_graph_arrays(obj) -> dict:
    """Pull edge arrays out of an unpickled tg Data object (tg1 or tg2)."""
    def as_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    attrs = dict(getattr(obj, "__dict__", {}))
    store = attrs.pop("_store", None)
    if store is not None:
        attrs.update(getattr(store, "_mapping", getattr(store, "__dict__", {})))
    out = {}
    for key in ("edge_index", "edge_latent"):
        if key in attrs and attrs[key] is not None:
            out[key] = as_np(attrs[key]).astype(np.int64)
    if "edge_index" not in out:
        raise ValueError(f"no edge_index found in graph object "
                         f"(keys: {sorted(attrs)})")
    return out


def convert_graph_dir(src: str, dst: str, verbose: bool = True) -> int:
    """Reference torch_geometric `.pt` WSI graphs -> `.npz` edge lists
    consumed by data/bags.py graph mode (edge_index [2, E] int64, plus
    edge_latent when the PatchGCN builder stored one)."""
    import torch
    _install_tg_unpickle_stubs()
    os.makedirs(dst, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(src)):
        stem, ext = osp.splitext(fname)
        if ext != ".pt":
            continue
        obj = torch.load(osp.join(src, fname), map_location="cpu",
                         weights_only=False)
        arrays = _extract_graph_arrays(obj)
        np.savez(osp.join(dst, stem + ".npz"), **arrays)
        n += 1
        if verbose and n % 100 == 0:
            print(f"[convert] {n} graphs...")
    if verbose:
        print(f"[convert] wrote {n} .npz graphs to {dst}")
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--f16", action="store_true", help="store as float16")
    ap.add_argument("--dtype", choices=["f32", "f16", "int8"], default=None,
                    help="int8 = pre-quantized .q8npz store with per-patch "
                         "scale + 1/l2norm sidecars")
    ap.add_argument("--graphs", action="store_true",
                    help="convert torch_geometric .pt graphs instead of features")
    args = ap.parse_args()
    if args.graphs:
        convert_graph_dir(args.src, args.dst)
    else:
        convert_dir(args.src, args.dst, f16=args.f16, dtype=args.dtype)
