#!/usr/bin/env python
"""Mesh-scaling evidence on the virtual CPU backend (VERDICT r3 next#4).

Runs the production `TrainEngine` VLSA train step at a FIXED global batch
over data-parallel meshes of increasing size (1, 2, 4, 8 devices) on the
8-device virtual CPU mesh, and records

  * the per-step loss at every mesh size — asserted IDENTICAL (f32 tol):
    data-parallel sharding must not change the math at any mesh size,
  * relative per-step wall time vs mesh size.

Caveat stated in the artifact: virtual CPU "devices" are threads on shared
host cores, so absolute wall-time scaling is NOT a TPU prediction — the
numbers only demonstrate that XLA partitions the step and that per-device
work shrinks with the mesh.  The v5e-8 throughput projection is the
roofline argument in docs/PERF.md (ICI terms measured negligible), anchored
by the single-chip measurement in BENCH.

Usage:
  python scripts/scaling_cpu.py                 # full tower, N=2048
  python scripts/scaling_cpu.py --small         # CI smoke
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(small: bool, n_patches: int, global_batch: int, steps: int,
        mesh_sizes=(1, 2, 4, 8)):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(mesh_sizes)}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from vlsa_tpu.losses import surv_emd, surv_ifmle
    from vlsa_tpu.optim import create_optimizer
    from vlsa_tpu.parallel import make_mesh
    from vlsa_tpu.runner.engine import TrainEngine, make_objective

    dim_in = 512
    model, params0 = _build_flagship(small=small)
    frozen = jax.tree.map(lambda _: False, dict(params0))
    frozen["prompt_encoder"] = jax.tree.map(
        lambda _: True, dict(params0)["prompt_encoder"])

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(global_batch, n_patches, dim_in)).astype(np.float32)
    t = rng.integers(0, 12, size=global_batch).astype(np.int32)
    e = rng.integers(0, 2, size=global_batch).astype(np.float32)

    rows = []
    for n in mesh_sizes:
        mesh = make_mesh(n_data=n, n_model=1,
                         devices=jax.devices()[:n])
        tx = create_optimizer("adam", 2e-4, 1e-5, params0, frozen=frozen)
        objective = make_objective(
            {"SurvIFMLE": surv_ifmle, "SurvEMD": surv_emd},
            {"SurvIFMLE": 1.0, "SurvEMD": 1.0},
            lambda x: jax.nn.softmax(x, axis=-1), uses_vl=True)
        eng = TrainEngine(model, tx, objective, uses_vl=True, mesh=mesh,
                          frozen=frozen, tensor_parallel=False,
                          seq_parallel=False)
        params = eng.shard_params(jax.tree.map(jnp.asarray, params0))
        opt_state = eng.init_opt_state(params)
        batch = eng.shard_batch({
            "feats": jnp.asarray(feats),
            "mask": jnp.ones((global_batch, n_patches), bool),
            "t": jnp.asarray(t), "e": jnp.asarray(e),
            "valid": jnp.ones((global_batch,), bool),
        })
        step = eng.train_step()
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          jax.random.PRNGKey(0))
        first_loss = float(loss)  # loss after the FIRST update, pre-warmup
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state, loss, _ = step(params, opt_state, batch,
                                              jax.random.PRNGKey(0))
            _ = float(loss)
        dt = (time.perf_counter() - t0) / steps
        rows.append({"mesh_data": n, "step_ms": round(dt * 1e3, 1),
                     "loss_after_step1": first_loss,
                     "slides_per_sec_cpu": round(global_batch / dt, 2)})
        print(f"[scaling] data={n}: {dt*1e3:.1f} ms/step, "
              f"loss@1 = {first_loss:.6f}")

    losses = [r["loss_after_step1"] for r in rows]
    max_dev = max(abs(l - losses[0]) for l in losses)
    assert max_dev < 5e-5, (
        f"loss after one update differs across mesh sizes: {losses}")
    return {
        "global_batch": global_batch,
        "n_patches": n_patches,
        "small_tower": small,
        "steps_timed": steps,
        "mesh_rows": rows,
        "loss_max_dev_across_meshes": max_dev,
        "wall_time_ratio_1_to_8_cpu_only": round(
            rows[0]["step_ms"] / rows[-1]["step_ms"], 2),
        "note": ("fixed global batch, data-parallel mesh on the virtual CPU "
                 "backend; losses must agree bit-near-exactly across mesh "
                 "sizes (sharding does not change the math).  "
                 "wall_time_ratio_1_to_8_cpu_only < 1 is EXPECTED: the CPU "
                 "'devices' share host cores, so this is a partition "
                 "correctness check, not a TPU prediction — see docs/PERF.md "
                 "for the roofline-argued v5e-8 projection."),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--n_patches", type=int, default=None)
    ap.add_argument("--global_batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_CPU.json"))
    args = ap.parse_args()
    n_patches = args.n_patches or (256 if args.small else 2048)
    result = run(args.small, n_patches, args.global_batch, args.steps)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
