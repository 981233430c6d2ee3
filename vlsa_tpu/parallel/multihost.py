"""Multi-host (multi-process) groundwork: jax.distributed bring-up and
process-local batch assembly.

The reference is strictly single-process (SURVEY.md §2.8); this implements
the TPU-pod story: each host runs the same program, loads ONLY its shard of
every global batch (BagBatcher num_shards/shard_index), and
`make_global_batch` assembles the jax.Arrays from per-process shards without
any cross-host data movement (jax.make_array_from_process_local_data).
Collectives then ride ICI within a slice and DCN across slices
(parallel.sharding.make_mesh dcn_data axis).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import batch_pspec


def maybe_initialize_distributed(cfg: dict) -> bool:
    """`jax.distributed.initialize` from the config, before any device use.

    cfg['distributed'] may be:
      * 'auto'  — initialize() with no args (coordinator from the standard
        env: JAX_COORDINATOR_ADDRESS / TPU pod metadata),
      * a dict {coordinator_address, num_processes, process_id[,
        local_device_ids]} for explicit bring-up,
      * absent/falsey — single-process (no-op).
    Returns True when distributed was initialized.
    """
    spec = cfg.get("distributed")
    if not spec:
        return False
    # NOTE: do NOT probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized
    if spec == "auto":
        jax.distributed.initialize()
    else:
        kws = {k: spec[k] for k in ("coordinator_address", "num_processes",
                                    "process_id", "local_device_ids")
               if k in spec}
        jax.distributed.initialize(**kws)
    print(f"[setup] jax.distributed: process {jax.process_index()} / "
          f"{jax.process_count()}, {jax.local_device_count()} local devices")
    return True


def process_shard_info() -> tuple:
    """(shard_index, num_shards) for host-local data loading."""
    return jax.process_index(), jax.process_count()


def collect_global(x) -> "np.ndarray":
    """Fetch a (possibly multi-host sharded) jax.Array to host numpy.

    Single-process / fully-addressable arrays take the plain `np.asarray`
    path; on a pod, shards living on other hosts are gathered with
    `multihost_utils.process_allgather` (one DCN all-gather of the model
    outputs per eval batch — the [B, K] logits, never the bags).
    """
    import numpy as np
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def host_allgather(x) -> "np.ndarray":
    """Concatenate per-host numpy arrays across processes (axis 0).

    The BagBatcher's multi-host mode gives every process the contiguous
    `shard_index`-th slice of each global batch, so concatenation in process
    order restores the global batch order.  Single-process: identity.
    """
    import numpy as np
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def make_global_batch(local_batch: dict, mesh: Mesh,
                      seq_parallel: bool = False) -> dict:
    """Assemble global jax.Arrays from this process's local batch shard.

    Each host passes only its `global_B / process_count` bags; the returned
    arrays are globally-shaped with the standard batch partition specs.
    Single-process this is equivalent to a plain sharded device_put.
    """
    specs = batch_pspec(seq_parallel)
    out = {}
    for k, v in local_batch.items():
        sharding = NamedSharding(mesh, specs.get(k, P("data")))
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
