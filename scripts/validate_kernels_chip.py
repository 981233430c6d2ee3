"""On-chip numerics validation of the headline training kernels.

The co-attention (f32 / bf16-hilo / int8+inv) and ABMIL (f32 / q8) Pallas
kernels carry the headline slides/sec number, but until round 5 their
fwd+bwd outputs were parity-tested ONLY in interpreter mode
(tests/test_models.py, tests/test_int8.py set INTERPRET=True) — the
Mosaic-compiled programs the chip actually runs were asserted nowhere
(VERDICT r4 weak#4).  This script runs the REAL kernels on the REAL chip
against the pure-XLA f32 reference on identical data and asserts the
documented tolerances (docs/PERF.md: fwd ~1e-5..1e-4 rel, dQ ~1e-4..1e-3
rel; bf16/int8 lanes compare against the f32 reference on the SAME
rounded/dequantized data so the check isolates KERNEL error from the
storage rounding the user opted into).

Checks (each production path bench.py exercises):
  * coattn f32, full backward (dQ + dX)          — ref model/deepmil.py:185-204
  * coattn f32, stop-gradient (dQ-only)          — the production f32 route
  * coattn bf16 storage, stop-gradient (dQ-only) — the bf16 lane
  * coattn bf16 storage, full backward (dQ + dX) — the use_feat_proj route
  * coattn int8 + host inv-norms, stop-gradient  — the headline int8 lane
  * ABMIL f32 fused fwd + full backward          — SA-handler production path
  * ABMIL q8 fused fwd + weight-grads backward   — SA int8 lane

Writes KERNELS_CHIP.json at the repo root and exits non-zero on any
tolerance failure.  bench.py runs a reduced-shape version of the same
checks as a budget-gated lane so every driver bench revalidates on-chip
numerics alongside the throughput number.

Usage: python scripts/validate_kernels_chip.py [--batch 8] [--n 10240]
"""
import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _rel(a, b) -> float:
    import jax.numpy as jnp
    denom = float(jnp.max(jnp.abs(b))) + 1e-12
    return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32)))) / denom


def run_checks(B: int = 8, N: int = 10240, C: int = 512, P: int = 12,
               hid: int = 256, seed: int = 0, paths=None) -> dict:
    """Run every kernel-vs-XLA-f32 check on the current backend.  Returns
    a dict with per-path relative deviations and ok flags; importable so
    bench.py can run a reduced-shape lane (`paths` selects a subset, e.g.
    the headline int8 pair)."""
    import jax
    import jax.numpy as jnp

    import vlsa_tpu.ops.abmil as ab
    import vlsa_tpu.ops.coattn as co
    from vlsa_tpu.data.pipeline import feats_inv_norms, quantize_feats_int8

    # The XLA reference must compute its matmuls in REAL f32: TPU's
    # default matmul precision is bf16xbf16 passes, and the coattn logits
    # go through softmax(scale * logit) with scale~30 — bf16 logit rounding
    # (~3e-3) becomes ~10% attention-weight error, which would be charged
    # to the KERNEL being validated (measured exactly that in the first
    # chip run: rel_dev ~0.06-0.16 with a bf16-precision reference).
    # Precision is scoped to the reference TRACE only — setting it
    # globally leaks into the Pallas kernel bodies and crashes the Mosaic
    # compiler (second chip run: every kernel compile returned HTTP 500).
    def ref_call(fn, *args):
        with jax.default_matmul_precision("highest"):
            return jax.jit(fn)(*args)

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(P, C)).astype(np.float32))
    x_f = rng.normal(size=(B, N, C)).astype(np.float32)
    mask_np = rng.random((B, N)) > 0.1
    x_f[~mask_np] = 0.0
    x = jnp.asarray(x_f)
    mask = jnp.asarray(mask_np)
    scale = jnp.float32(30.0)
    out: dict = {"backend": jax.default_backend(),
                 "shapes": {"B": B, "N": N, "C": C, "P": P, "hid": hid}}

    # tolerances: fwd / dQ / dX per path (docs/PERF.md round-2 table;
    # bf16/int8 fwd picks up one extra rounding of the M-side matrices)
    TOL = {
        "coattn_f32":  {"fwd": 1e-4, "dq": 1e-3, "dx": 1e-3},
        "coattn_f32_nodx": {"fwd": 1e-4, "dq": 1e-3},
        "coattn_bf16": {"fwd": 1e-3, "dq": 2e-3},
        "coattn_bf16_dx": {"dq": 2e-3, "dx": 2e-2},
        "coattn_int8": {"fwd": 1e-3, "dq": 2e-3},
        "abmil_f32":   {"fwd": 1e-4, "dw": 1e-3, "dx": 1e-3},
        "abmil_q8":    {"fwd": 1e-3, "dw": 2e-3},
    }

    def record(name, devs):
        tol = TOL[name]
        ok = all(devs[k] <= tol[k] for k in devs)
        out[name] = {**{f"rel_dev_{k}": v for k, v in devs.items()},
                     "tol": tol, "ok": ok}

    def check(name, fn):
        """Exception-isolate each path: a Mosaic compile failure on one
        kernel (the class of bug this script exists to find) must not
        hide the results of the others."""
        if paths is not None and name not in paths:
            return
        import time
        t0 = time.monotonic()
        print(f"[kernels-chip] {name}: start", file=sys.stderr, flush=True)
        try:
            record(name, fn())
        except Exception as exc:
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:500],
                         "ok": False}
        print(f"[kernels-chip] {name}: done in "
              f"{time.monotonic() - t0:.0f}s -> {out[name].get('ok')}",
              file=sys.stderr, flush=True)

    # ---- coattn f32, full backward (the dX-capable kernel) ----
    def _coattn_f32():
        fwd_dev = _rel(
            jax.jit(lambda q_, x_: co.coattn_pool(
                q_, x_, mask, scale, use_pallas=True))(q, x),
            ref_call(lambda q_, x_: co.coattn_pool_reference(
                q_, x_, mask, 30.0), q, x))
        gk = jax.jit(jax.grad(lambda q_, x_: jnp.sum(co.coattn_pool(
            q_, x_, mask, scale, use_pallas=True) ** 2),
            argnums=(0, 1)))(q, x)
        gr = ref_call(jax.grad(lambda q_, x_: jnp.sum(
            co.coattn_pool_reference(q_, x_, mask, 30.0) ** 2),
            argnums=(0, 1)), q, x)
        return {"fwd": fwd_dev, "dq": _rel(gk[0], gr[0]),
                "dx": _rel(gk[1], gr[1])}
    check("coattn_f32", _coattn_f32)

    # ---- coattn f32 stop-gradient (the PRODUCTION f32 route: VLFAN
    # without a feat projecter declares X constant -> dQ-only kernel) ----
    def _coattn_f32_nodx():
        f = lambda q_: co.coattn_pool(q_, x, mask, scale, use_pallas=True,
                                      x_stop_gradient=True)
        fwd_dev = _rel(
            jax.jit(f)(q),
            ref_call(lambda q_: co.coattn_pool_reference(
                q_, x, mask, 30.0), q))
        dq_k = jax.jit(jax.grad(lambda q_: jnp.sum(f(q_) ** 2)))(q)
        dq_r = ref_call(jax.grad(lambda q_: jnp.sum(
            co.coattn_pool_reference(q_, x, mask, 30.0) ** 2)), q)
        return {"fwd": fwd_dev, "dq": _rel(dq_k, dq_r)}
    check("coattn_f32_nodx", _coattn_f32_nodx)

    # ---- coattn bf16 storage, stop-gradient (production bf16 lane) ----
    xb = x.astype(jnp.bfloat16)
    x_as32 = xb.astype(jnp.float32)   # same storage rounding, f32 compute

    def _coattn_bf16():
        fwd_dev = _rel(
            jax.jit(lambda q_: co.coattn_pool(
                q_, xb, mask, scale, use_pallas=True,
                x_stop_gradient=True))(q),
            ref_call(lambda q_: co.coattn_pool_reference(
                q_, x_as32, mask, 30.0), q))
        dq_k = jax.jit(jax.grad(lambda q_: jnp.sum(co.coattn_pool(
            q_, xb, mask, scale, use_pallas=True,
            x_stop_gradient=True) ** 2)))(q)
        dq_r = ref_call(jax.grad(lambda q_: jnp.sum(
            co.coattn_pool_reference(q_, x_as32, mask, 30.0) ** 2)), q)
        return {"fwd": fwd_dev, "dq": _rel(dq_k, dq_r)}
    check("coattn_bf16", _coattn_bf16)

    # ---- coattn bf16 full backward (use_feat_proj route: dX written in
    # the bf16 storage dtype, hence the looser dX bound) ----
    def _coattn_bf16_dx():
        gk = jax.jit(jax.grad(lambda q_, x_: jnp.sum(co.coattn_pool(
            q_, x_, mask, scale, use_pallas=True) ** 2),
            argnums=(0, 1)))(q, xb)
        gr = ref_call(jax.grad(lambda q_, x_: jnp.sum(
            co.coattn_pool_reference(q_, x_, mask, 30.0) ** 2),
            argnums=(0, 1)), q, x_as32)
        return {"dq": _rel(gk[0], gr[0]), "dx": _rel(gk[1], gr[1])}
    check("coattn_bf16_dx", _coattn_bf16_dx)

    # ---- coattn int8 + host inv norms (the headline int8 lane) ----
    x_i_np, s_np = quantize_feats_int8(x_f)
    x_i, s_q = jnp.asarray(x_i_np), jnp.asarray(s_np)
    inv = jnp.asarray(feats_inv_norms(x_i_np))
    x_deq = jnp.asarray(x_i_np.astype(np.float32) * s_np[..., None])

    def _coattn_int8():
        fwd_dev = _rel(
            jax.jit(lambda q_: co.coattn_pool(
                q_, x_i, mask, scale, use_pallas=True, x_stop_gradient=True,
                x_scale=s_q, x_inv=inv))(q),
            ref_call(lambda q_: co.coattn_pool_reference(
                q_, x_deq, mask, 30.0), q))
        dq_k = jax.jit(jax.grad(lambda q_: jnp.sum(co.coattn_pool(
            q_, x_i, mask, scale, use_pallas=True, x_stop_gradient=True,
            x_scale=s_q, x_inv=inv) ** 2)))(q)
        dq_r = ref_call(jax.grad(lambda q_: jnp.sum(
            co.coattn_pool_reference(q_, x_deq, mask, 30.0) ** 2)), q)
        return {"fwd": fwd_dev, "dq": _rel(dq_k, dq_r)}
    check("coattn_int8", _coattn_int8)

    # ---- ABMIL f32 fused fwd + full backward ----
    w1 = jnp.asarray(rng.normal(size=(hid, C)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.3)
    b2 = jnp.float32(0.0)

    def _abmil_f32():
        fwd_dev = _rel(
            jax.jit(lambda x_: ab.abmil_pool(x_, mask, w1, b1, w2, b2,
                                             use_pallas=True))(x),
            ref_call(lambda x_: ab.abmil_pool_reference(
                x_, mask, w1, b1, w2, b2)[0], x))
        gk = jax.jit(jax.grad(lambda x_, w1_, b1_, w2_: jnp.sum(
            ab.abmil_pool(x_, mask, w1_, b1_, w2_, b2,
                          use_pallas=True) ** 2),
            argnums=(0, 1, 2, 3)))(x, w1, b1, w2)
        gr = ref_call(jax.grad(lambda x_, w1_, b1_, w2_: jnp.sum(
            ab.abmil_pool_reference(x_, mask, w1_, b1_, w2_, b2)[0] ** 2),
            argnums=(0, 1, 2, 3)), x, w1, b1, w2)
        return {"fwd": fwd_dev,
                "dx": _rel(gk[0], gr[0]),
                "dw": max(_rel(a, b) for a, b in zip(gk[1:], gr[1:]))}
    check("abmil_f32", _abmil_f32)

    # ---- ABMIL q8 fused fwd + weight grads ----
    def _abmil_q8():
        fwd_dev = _rel(
            jax.jit(lambda w1_: ab.abmil_pool(
                x_i, mask, w1_, b1, w2, b2, use_pallas=True,
                x_scale=s_q))(w1),
            ref_call(lambda w1_: ab.abmil_pool_reference(
                x_deq, mask, w1_, b1, w2, b2)[0], w1))
        gk = jax.jit(jax.grad(lambda w1_, b1_, w2_: jnp.sum(ab.abmil_pool(
            x_i, mask, w1_, b1_, w2_, b2, use_pallas=True,
            x_scale=s_q) ** 2), argnums=(0, 1, 2)))(w1, b1, w2)
        gr = ref_call(jax.grad(lambda w1_, b1_, w2_: jnp.sum(
            ab.abmil_pool_reference(x_deq, mask, w1_, b1_, w2_,
                                    b2)[0] ** 2),
            argnums=(0, 1, 2)), w1, b1, w2)
        return {"fwd": fwd_dev,
                "dw": max(_rel(a, b) for a, b in zip(gk, gr))}
    check("abmil_q8", _abmil_q8)

    out["ok"] = all(out[k]["ok"] for k in TOL if k in out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=10240)
    ap.add_argument("--dim", type=int, default=512)
    args = ap.parse_args()

    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": f"backend={jax.default_backend()} "
                          "(the point is the Mosaic-compiled kernels; "
                          "interpreter parity lives in the test suite)"}))
        return 0

    result = run_checks(B=args.batch, N=args.n, C=args.dim)
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "KERNELS_CHIP.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
