"""Decompose the production train/infer step time (B=128, N=10240).

Measures, with the same honest scanned timing as bench.py:
  A. full train step (tower + coattn fwd/bwd-dQ + losses + adam)
  B. train step with CONSTANT text features (tower removed)
  C. infer step (full) and D. infer with constant text features
  E. coattn forward kernel alone, F. coattn fwd + dQ backward alone

=> tower cost = A - B (train) / C - D (infer); kernel floor = E/F;
   residual = B - F (losses, optimizer, logits head, norms).
"""
from __future__ import annotations

import functools
import time

import numpy as np

B, N, D, K = 128, 10240, 512, 12
SCAN_N = 20


def timed(fn, *args, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / SCAN_N)
    return best * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import optax

    import os, sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from __graft_entry__ import _build_flagship
    from vlsa_tpu.losses import surv_emd, surv_ifmle
    from vlsa_tpu.optim import create_optimizer
    from vlsa_tpu.ops.coattn import coattn_pool
    from vlsa_tpu.ops.masked import l2_normalize

    model, params = _build_flagship(small=False, tower_dtype="bfloat16")
    frozen = jax.tree.map(lambda _: False, dict(params))
    frozen["prompt_encoder"] = jax.tree.map(
        lambda _: True, dict(params)["prompt_encoder"])
    tx = create_optimizer("adam", 2e-4, 1e-5, params, frozen=frozen)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    t = jnp.asarray(rng.integers(0, K, size=B), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=B), jnp.float32)
    key = jax.random.PRNGKey(0)

    # precomputed text features for the tower-less variants
    text_const = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    def loss_from_logits(p, logits):
        probs = jax.nn.softmax(logits, axis=-1)
        ls = jnp.exp(p["logit_scale"])
        return surv_ifmle(probs, t, e) + surv_emd(probs, t, e, ls)

    def train_full(p, o, _key, i):
        def loss_fn(p):
            p = dict(p, prompt_encoder=jax.lax.stop_gradient(p["prompt_encoder"]))
            logits, _i, _t = model.apply({"params": p}, feats, mask)
            return loss_from_logits(p, logits)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    mil = model.mil_encoder

    def img_branch(p, train=False):
        q = model.apply({"params": p}, method=model.get_query)
        out = mil.apply({"params": dict(p)["mil_encoder"]}, feats, mask, query=q)
        return out

    def train_notower(p, o, _key, i):
        def loss_fn(p):
            img = img_branch(p)
            img_n = l2_normalize(img, axis=-1)
            text_n = l2_normalize(text_const, axis=-1)
            logits = jnp.exp(p["logit_scale"]) * img_n @ text_n.T
            return loss_from_logits(p, logits)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def infer_full(p, chain):
        logits, _i, _t = model.apply({"params": p}, feats, mask)
        return logits + chain * 1e-30

    def infer_notower(p, chain):
        img = img_branch(p)
        img_n = l2_normalize(img, axis=-1)
        text_n = l2_normalize(text_const, axis=-1)
        return jnp.exp(p["logit_scale"]) * img_n @ text_n.T + chain * 1e-30

    q_const = jnp.asarray(rng.normal(size=(12, D)).astype(np.float32))
    q_eff = l2_normalize(q_const, axis=-1)

    def kernel_fwd(chain):
        out = coattn_pool(q_eff + chain * 1e-30, feats, mask, 100.0,
                          x_stop_gradient=True)
        return out

    def kernel_fwd_bwd(q, chain):
        def f(q):
            out = coattn_pool(q, feats, mask, 100.0, x_stop_gradient=True)
            return jnp.sum(out * 1e-6)
        val, g = jax.value_and_grad(f)(q + chain * 1e-30)
        return g

    # ---- scanned wrappers (train variants carry (params, opt); infer/kernel
    # chain a scalar so successive iterations stay data-dependent) ----
    def scan_train(step):
        def run(p, o):
            def body(carry, i):
                p, o = carry
                p, o, loss = step(p, o, key, i)
                return (p, o), loss
            (_p, _o), losses = jax.lax.scan(body, (p, o), jnp.arange(SCAN_N))
            return losses[-1]
        return jax.jit(run)

    def scan_chain(fn, *extra):
        def run(p):
            def body(chain, i):
                out = fn(p, chain) if not extra else fn(*extra, chain)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30, out
            chain, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
            return jax.tree.leaves(outs)[0][-1]
        return jax.jit(run)

    def scan_kernel(fn, with_q=False):
        def run(_p):
            def body(chain, i):
                out = fn(q_eff, chain) if with_q else fn(chain)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30, \
                    jnp.asarray(out, jnp.float32).ravel()[0]
            chain, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
            return outs[-1]
        return jax.jit(run)

    results = {}
    def note(k):
        print(f"[decompose] {k} done", flush=True)
    f_train = scan_train(train_full)
    _ = float(np.asarray(f_train(params, opt_state)))
    results["A_train_full_ms"] = timed(f_train, params, opt_state)
    note("A_train_full_ms")

    f_nt = scan_train(train_notower)
    _ = float(np.asarray(f_nt(params, opt_state)))
    results["B_train_notower_ms"] = timed(f_nt, params, opt_state)
    note("B_train_notower_ms")

    f_inf = scan_chain(infer_full)
    _ = float(np.asarray(f_inf(params)))
    results["C_infer_full_ms"] = timed(f_inf, params)
    note("C_infer_full_ms")

    f_infnt = scan_chain(infer_notower)
    _ = float(np.asarray(f_infnt(params)))
    results["D_infer_notower_ms"] = timed(f_infnt, params)
    note("D_infer_notower_ms")

    f_k = scan_kernel(kernel_fwd)
    _ = float(np.asarray(f_k(params)))
    results["E_kernel_fwd_ms"] = timed(f_k, params)
    note("E_kernel_fwd_ms")

    f_kb = scan_kernel(kernel_fwd_bwd, with_q=True)
    _ = float(np.asarray(f_kb(params)))
    results["F_kernel_fwd_bwd_ms"] = timed(f_kb, params)
    note("F_kernel_fwd_bwd_ms")

    results["tower_train_ms"] = round(
        results["A_train_full_ms"] - results["B_train_notower_ms"], 2)
    results["tower_infer_ms"] = round(
        results["C_infer_full_ms"] - results["D_infer_notower_ms"], 2)
    results["residual_train_ms"] = round(
        results["B_train_notower_ms"] - results["F_kernel_fwd_bwd_ms"], 2)
    import json
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
