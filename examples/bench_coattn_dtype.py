"""A/B the co-attention kernel across feature storage dtypes (f32 vs bf16).

The production kernels (vlsa_tpu/ops/coattn.py) pick their MXU operand dtype
from X's storage dtype: bf16-stored features stream in native bf16 (with
hi+lo splits for the small M-side matrices recovering ~f32 accuracy), f32
features keep the exact f32 path.  This script measures fwd and fwd+bwd(dQ)
for both on the production shape and reports the speedup and the precision
delta.  Run exclusively on the chip (the tunnel dislikes concurrent clients).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B, N, D, P = 128, 10240, 512, 12
SCAN_N = 20


def main():
    import jax
    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from vlsa_tpu.ops.coattn import coattn_pool

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x32 = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    g = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32)) * 1e-2
    scale = 100.0

    # x is a jit ARGUMENT (a closure constant would be inlined into the
    # program and overflow the remote compile service)
    @jax.jit
    def scan_fwd(q0, x):
        def body(chain, _):
            out = coattn_pool(q0 + chain * 1e-30, x, mask, scale)
            return out.ravel()[0] * 1e-30, out.ravel()[0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    @jax.jit
    def scan_tb(q0, x):
        def step(q_):
            out = coattn_pool(q_, x, mask, scale, x_stop_gradient=True)
            return jnp.sum(out * g)
        def body(chain, _):
            dq = jax.grad(step)(q0 + chain * 1e-30)
            return dq.ravel()[0] * 1e-30, dq.ravel()[0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    def timed(fn, *args, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(np.asarray(out).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / SCAN_N)
        return best * 1e3

    results = {}
    outs = {}
    pool_jit = jax.jit(lambda q_, x_: coattn_pool(q_, x_, mask, scale))
    for name, x in [("f32", x32), ("bf16", x32.astype(jnp.bfloat16))]:
        _ = float(np.asarray(scan_fwd(q, x)))
        results[f"fwd_{name}_ms"] = timed(scan_fwd, q, x)
        print(f"[ab] fwd_{name} done", flush=True)
        _ = float(np.asarray(scan_tb(q, x)))
        results[f"fwd_bwd_{name}_ms"] = timed(scan_tb, q, x)
        print(f"[ab] fwd_bwd_{name} done", flush=True)
        outs[name] = np.asarray(pool_jit(q, x))

    results["fwd_speedup"] = round(results["fwd_f32_ms"] / results["fwd_bf16_ms"], 2)
    results["fwd_bwd_speedup"] = round(
        results["fwd_bwd_f32_ms"] / results["fwd_bwd_bf16_ms"], 2)
    results["out_rel_fro_diff"] = float(
        np.linalg.norm(outs["f32"] - outs["bf16"]) / np.linalg.norm(outs["f32"]))
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
