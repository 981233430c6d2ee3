"""Decompose the production train/infer step time (B=128, N=10240).

Measures, with the same honest scanned timing as bench.py:
  A. full train step (tower + coattn fwd/bwd-dQ + losses + adam)
  B. train step with CONSTANT text features (tower removed)
  C. infer step (full) and D. infer with constant text features
  E. coattn forward kernel alone, F. coattn fwd + dQ backward alone

=> tower cost = A - B (train) / C - D (infer); kernel floor = E/F;
   residual = B - F (losses, optimizer, logits head, norms).

All big arrays are jit ARGUMENTS (closure constants would be inlined into
the program and overflow the remote compile service).
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
    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
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
    from vlsa_tpu.models.precision import cast_frozen_tower_weights
    params = cast_frozen_tower_weights(params)
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
    text_const = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    q_const = jnp.asarray(rng.normal(size=(12, D)).astype(np.float32))

    def loss_from_logits(p, logits):
        probs = jax.nn.softmax(logits, axis=-1)
        ls = jnp.exp(p["logit_scale"])
        return surv_ifmle(probs, t, e) + surv_emd(probs, t, e, ls)

    mil = model.mil_encoder

    def img_branch(p, feats, mask):
        q = model.apply({"params": p}, method=model.get_query)
        return mil.apply({"params": dict(p)["mil_encoder"]}, feats, mask, query=q)

    def train_full_step(p, o, feats, mask):
        def loss_fn(p):
            p = dict(p, prompt_encoder=jax.lax.stop_gradient(p["prompt_encoder"]))
            logits, _i, _t = model.apply({"params": p}, feats, mask)
            return loss_from_logits(p, logits)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def train_notower_step(p, o, feats, mask):
        def loss_fn(p):
            img = img_branch(p, feats, mask)
            img_n = l2_normalize(img, axis=-1)
            text_n = l2_normalize(text_const, axis=-1)
            logits = jnp.exp(p["logit_scale"]) * img_n @ text_n.T
            return loss_from_logits(p, logits)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def scan_train(step):
        @jax.jit
        def run(p, o, feats, mask):
            def body(carry, i):
                p, o = carry
                p, o, loss = step(p, o, feats, mask)
                return (p, o), loss
            (_p, _o), losses = jax.lax.scan(body, (p, o), jnp.arange(SCAN_N))
            return losses[-1]
        return run

    def perturb(p, chain):
        p = dict(p)
        pl_tree = dict(p["prompt_learner"])
        pl_tree["context_embeds"] = pl_tree["context_embeds"] + chain * 1e-30
        p["prompt_learner"] = pl_tree
        if "query_adapter" in p:
            qa = dict(p["query_adapter"])
            qa["residual_features"] = qa["residual_features"] + chain * 1e-30
            p["query_adapter"] = qa
        return p

    @jax.jit
    def infer_full(p, feats, mask):
        def body(chain, _):
            logits, _i, _t = model.apply({"params": perturb(p, chain)}, feats, mask)
            return logits[0, 0] * 1e-30, logits[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    @jax.jit
    def infer_notower(p, feats, mask):
        def body(chain, _):
            img = img_branch(perturb(p, chain), feats, mask)
            img_n = l2_normalize(img, axis=-1)
            text_n = l2_normalize(text_const, axis=-1)
            out = jnp.exp(p["logit_scale"]) * img_n @ text_n.T
            return out[0, 0] * 1e-30, out[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    @jax.jit
    def kernel_fwd(q, feats, mask):
        q_eff = l2_normalize(q, axis=-1)
        def body(chain, _):
            out = coattn_pool(q_eff + chain * 1e-30, feats, mask, 100.0,
                              x_stop_gradient=True)
            return out[0, 0, 0] * 1e-30, out[0, 0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    @jax.jit
    def kernel_fwd_bwd(q, feats, mask):
        q_eff = l2_normalize(q, axis=-1)
        def step(q_):
            out = coattn_pool(q_, feats, mask, 100.0, x_stop_gradient=True)
            return jnp.sum(out * 1e-6)
        def body(chain, _):
            g = jax.grad(step)(q_eff + chain * 1e-30)
            return g[0, 0] * 1e-30, g[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN_N))
        return outs[-1]

    results = {}
    def note(k):
        print(f"[decompose] {k} done", flush=True)

    f_train = scan_train(train_full_step)
    _ = float(np.asarray(f_train(params, opt_state, feats, mask)))
    results["A_train_full_ms"] = timed(f_train, params, opt_state, feats, mask)
    note("A_train_full_ms")

    f_nt = scan_train(train_notower_step)
    _ = float(np.asarray(f_nt(params, opt_state, feats, mask)))
    results["B_train_notower_ms"] = timed(f_nt, params, opt_state, feats, mask)
    note("B_train_notower_ms")

    _ = float(np.asarray(infer_full(params, feats, mask)))
    results["C_infer_full_ms"] = timed(infer_full, params, feats, mask)
    note("C_infer_full_ms")

    _ = float(np.asarray(infer_notower(params, feats, mask)))
    results["D_infer_notower_ms"] = timed(infer_notower, params, feats, mask)
    note("D_infer_notower_ms")

    _ = float(np.asarray(kernel_fwd(q_const, feats, mask)))
    results["E_kernel_fwd_ms"] = timed(kernel_fwd, q_const, feats, mask)
    note("E_kernel_fwd_ms")

    _ = float(np.asarray(kernel_fwd_bwd(q_const, feats, mask)))
    results["F_kernel_fwd_bwd_ms"] = timed(kernel_fwd_bwd, q_const, feats, mask)
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
