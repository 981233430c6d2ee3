"""Checkpointing: best/last param snapshots with module filtering.

Mirrors ref runner/base_handler.py:641-693 semantics (best/last prefixes, a
`model_saver_module_filter` that drops frozen subtrees — e.g. the CONCH text
tower — keeping checkpoints ~MBs) using flax msgpack serialization.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from flax import serialization


def _filter_tree(tree: dict, module_filter: Optional[str]) -> dict:
    if module_filter is None:
        return tree
    return {k: v for k, v in tree.items() if module_filter not in k}


def _np_tree(tree):
    if isinstance(tree, dict):
        return {k: _np_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def save_checkpoint(path: str, epoch: int, params: dict,
                    module_filter: Optional[str] = None,
                    backend: str = "msgpack", opt_state=None):
    payload = {
        "epoch": epoch,
        "model": _filter_tree(_np_tree(dict(params)), module_filter),
    }
    if opt_state is not None:
        # optax states are namedtuple pytrees; flax's state-dict codec
        # flattens them to nested dicts (ref saves {'epoch','model',
        # 'optimizer'}, base_handler.py:641-683)
        payload["optimizer"] = _np_tree(serialization.to_state_dict(opt_state))
    if backend == "orbax":
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path) + ".orbax", payload, force=True)
        return
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path + ".orbax") or path.endswith(".orbax"):
        import orbax.checkpoint as ocp
        target = path if path.endswith(".orbax") else path + ".orbax"
        return ocp.PyTreeCheckpointer().restore(target)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def merge_params(params: dict, loaded: dict) -> dict:
    """strict=False load semantics (ref base_handler.py:609-612): loaded
    subtrees override; missing ones keep current values."""
    out = dict(params)
    for k, v in loaded.items():
        if k in out and isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out


def add_prefix_to_filename(path: str, prefix: str = "") -> str:
    dir_name, file_name = os.path.split(path)
    return os.path.join(dir_name, prefix + "_" + file_name)
