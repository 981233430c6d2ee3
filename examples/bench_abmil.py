"""SA-family (ABMIL) train-step benchmark: fused Pallas kernels vs pure XLA.

    python examples/bench_abmil.py            # fused (default)
    VLSA_TPU_DISABLE_PALLAS=1 python examples/bench_abmil.py
    FEATS_DTYPE=int8 python examples/bench_abmil.py   # native int8 q8 kernels

Uses the same honest timing as bench.py: N steps scanned inside one
compiled program, completion forced by a scalar host transfer.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

B, N, D, K = int(os.environ.get("B", 64)), 10240, 512, 12
SCAN_N = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    from vlsa_tpu.losses import surv_ifmle
    from vlsa_tpu.models import DeepMIL
    from vlsa_tpu.optim import create_optimizer

    model = DeepMIL(dim_in=D, dim_hid=256, num_cls=K, use_feat_proj=False,
                    pooling="attention", pred_head="default")
    rng = np.random.default_rng(0)
    feats_dtype = os.environ.get("FEATS_DTYPE", "bfloat16")
    f32 = rng.normal(size=(B, N, D)).astype(np.float32)
    x_scale = None
    if feats_dtype == "int8":
        from vlsa_tpu.data.pipeline import quantize_feats_int8
        q8, s8 = quantize_feats_int8(f32)
        feats = jnp.asarray(q8)
        x_scale = jnp.asarray(s8)
    else:
        feats = jnp.asarray(f32).astype(jnp.dtype(feats_dtype))
    del f32
    mask = jnp.ones((B, N), bool)
    t = jnp.asarray(rng.integers(0, K, size=B), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=B), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, mask,
                        x_scale=x_scale)["params"]
    tx = create_optimizer("adam", 2e-4, 1e-5, params)
    opt_state = tx.init(params)

    # data must be ARGUMENTS, not closure constants: a closed-over 640 MB
    # feats array is embedded in the HLO, which the remote compiler rejects
    def train_step(params, opt_state, feats, mask, t, e, key, x_scale=None):
        def loss_fn(p):
            logits = model.apply({"params": p}, feats, mask, train=True,
                                 rngs={"dropout": key}, x_scale=x_scale)
            probs = jax.nn.softmax(logits, -1)
            return surv_ifmle(probs, t, e)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def scan(params, opt_state, feats, mask, t, e, key, x_scale=None,
             n=SCAN_N):
        def body(carry, i):
            p, o = carry
            p, o, loss = train_step(p, o, feats, mask, t, e,
                                    jax.random.fold_in(key, i), x_scale)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n))
        return params, opt_state, losses[-1]

    fn = jax.jit(scan, donate_argnums=(0, 1))
    key = jax.random.PRNGKey(1)
    params, opt_state, loss = fn(params, opt_state, feats, mask, t, e, key,
                                 x_scale)
    _ = float(loss)
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        params, opt_state, loss = fn(params, opt_state, feats, mask, t, e,
                                     key, x_scale)
        _ = float(loss)
        best = min(best, (time.perf_counter() - t0) / SCAN_N)
    fused = os.environ.get("VLSA_TPU_DISABLE_PALLAS") != "1"
    print(f"[bench-abmil] fused={fused} feats={feats_dtype} B={B} N={N}: "
          f"train {best*1e3:.2f} ms/step = {B/best:.0f} slides/s")


if __name__ == "__main__":
    main()
