"""Capture a jax.profiler trace of the flagship train step on the current
backend (Perfetto-compatible; inspect with ui.perfetto.dev or TensorBoard).

    python examples/profile_step.py --out /tmp/vlsa-trace [--iters 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vlsa-trace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=10240)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _build_flagship
    from vlsa_tpu.losses import surv_ifmle
    from vlsa_tpu.optim import create_optimizer

    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    model, params = _build_flagship(small=False, tower_dtype="bfloat16")
    tx = create_optimizer("adam", 2e-4, 1e-5, params)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, feats, mask, t, e, rng):
        def loss_fn(p):
            logits, _i, _t = model.apply({"params": p}, feats, mask,
                                         train=True, rngs={"dropout": rng})
            return surv_ifmle(jax.nn.softmax(logits, -1), t, e)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    B, N, D, K = args.batch, args.n, 512, 12
    feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((B, N), bool)
    t = jnp.asarray(rng.integers(0, K, size=B), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=B), jnp.float32)
    key = jax.random.PRNGKey(0)

    params, opt_state, loss = step(params, opt_state, feats, mask, t, e, key)
    jax.block_until_ready(loss)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            params, opt_state, loss = step(params, opt_state, feats, mask, t, e, key)
        jax.block_until_ready(loss)
    print(f"[profile] trace written to {args.out}")


if __name__ == "__main__":
    main()
