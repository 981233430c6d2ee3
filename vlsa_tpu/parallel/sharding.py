"""Mesh + sharding layout for multi-chip execution.

The workload's natural axes (SURVEY.md §2.8):
  * `data`  — bags (patients) shard across chips: pure data parallelism,
    gradients all-reduce over ICI.
  * `model` — two tensor dimensions ride this axis:
      - the text tower's MLP hidden dim (tensor parallel: c_fc row-sharded,
        c_proj column-sharded, XLA inserts the psum),
      - the patch axis N of each bag (sequence parallel: the co-attention
        softmax over N runs as partial-softmax + collective combine, which
        XLA's SPMD partitioner derives from the sharded einsum).

The reference has no distributed support at all (single GPU, batch=1 —
ref utils/func.py:189-197); this module is new TPU-native capability.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None, dcn_data: Optional[int] = None) -> Mesh:
    """Data(+model) mesh.  `dcn_data` > 1 lays the outer data factor across
    slices/hosts (DCN) with ICI inside each slice — gradient all-reduces then
    hierarchically reduce within slices before crossing DCN (the standard
    multi-slice recipe).  Falls back to a flat mesh when only one slice is
    visible (e.g. the virtual CPU test mesh)."""
    if dcn_data and dcn_data > 1:
        from jax.experimental import mesh_utils
        n_avail = len(devices) if devices is not None else len(jax.devices())
        try:
            dev = mesh_utils.create_hybrid_device_mesh(
                (n_data or (n_avail // (dcn_data * n_model)), n_model),
                (dcn_data, 1), devices=devices)
            dev = dev.reshape(-1, n_model)
            return Mesh(dev, ("data", "model"))
        except (ValueError, AssertionError) as exc:
            print(f"[mesh] hybrid DCN mesh unavailable ({exc}); "
                  f"using a flat mesh with data={dcn_data}x{n_data or 'auto'}")
            # keep None as None: the flat path below re-infers the FULL
            # data extent from the device count (an inferred n_data here
            # would silently build a dcn_data*n_model-device mesh and idle
            # the rest)
            if n_data is not None:
                n_data = n_data * dcn_data
    devices = np.array(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh data={n_data} x model={n_model} needs {n_data * n_model} "
            f"devices but only {len(devices)} are visible "
            f"({devices[0].platform}). On a CPU host set `jax_platforms: cpu` "
            f"+ `jax_num_cpu_devices: {n_data * n_model}` in the config (or "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N).")
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def batch_pspec(seq_parallel: bool = False) -> dict:
    """PartitionSpecs for a padded bag batch dict (every key the runners
    produce; `shard_batch` falls back to P('data') for unknown keys)."""
    n_axis = "model" if seq_parallel else None
    return {
        "feats": P("data", n_axis, None),
        "feats_scale": P("data", n_axis),
        "feats_inv": P("data", n_axis),
        "mask": P("data", n_axis),
        "cluster_id": P("data", n_axis),
        # graph edge lists index into the *global* patch axis: replicate E
        "edge_index": P("data", None, None),
        "edge_valid": P("data", None),
        "t": P("data"),
        "e": P("data"),
        "idx": P("data"),
        "valid": P("data"),
    }


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding tree: replicate everything except the text-tower MLP,
    whose hidden dimension shards over `model` (tensor parallel)."""
    def spec_for(path) -> P:
        names = [str(getattr(p, "key", p)) for p in path]
        if tensor_parallel and any(n.startswith("resblock_") for n in names):
            leafname = names[-1]
            if leafname == "c_fc_weight":
                return P("model", None)   # [mlp_width, D] row-shard
            if leafname == "c_fc_bias":
                return P("model")
            if leafname == "c_proj_weight":
                return P(None, "model")   # [D, mlp_width] column-shard
        if tensor_parallel and "blocks" in names:
            # scan_layers layout: same TP split behind a leading layer axis
            leafname = names[-1]
            if leafname == "c_fc_weight":
                return P(None, "model", None)   # [L, mlp_width, D]
            if leafname == "c_fc_bias":
                return P(None, "model")
            if leafname == "c_proj_weight":
                return P(None, None, "model")   # [L, D, mlp_width]
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
