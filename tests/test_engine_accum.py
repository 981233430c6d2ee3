"""Gradient-accumulation scan path must match the single-step gradient."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from vlsa_tpu.models import DeepMIL
from vlsa_tpu.runner.engine import TrainEngine, make_objective, make_output_converter
from vlsa_tpu.losses import load_loss


def _setup(accum):
    model = DeepMIL(dim_in=16, dim_hid=8, num_cls=3, use_feat_proj=False,
                    pooling="attention")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((8, 32), bool))["params"]
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)
    loss_fns = load_loss("sa", loss_type=["SurvIFMLE"], SurvIFMLE={})
    objective = make_objective(loss_fns, {"SurvIFMLE": 1.0},
                               make_output_converter("softmax"), uses_vl=False)
    eng = TrainEngine(model, tx, objective, uses_vl=False, accum_steps=accum)
    batch = {
        "feats": x, "mask": jnp.ones((8, 32), bool),
        "t": jnp.asarray(rng.integers(0, 3, size=8), jnp.int32),
        "e": jnp.asarray(rng.integers(0, 2, size=8), jnp.float32),
        "idx": jnp.arange(8, dtype=jnp.int32), "valid": jnp.ones((8,), bool),
    }
    return eng, params, opt_state, batch


def test_accum_matches_single_step():
    eng1, params, opt_state, batch = _setup(1)
    eng4, params4, opt_state4, _ = _setup(4)
    key = jax.random.PRNGKey(1)
    p1, _, l1, r1 = eng1.train_step()(params, opt_state, batch, key)
    p4, _, l4, r4 = eng4.train_step()(params4, opt_state4, batch, key)
    # note: dropout rngs differ per microbatch; DeepMIL attention pooling has
    # no dropout here, so outputs must match
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r4), rtol=1e-5, atol=1e-6)


def test_accum_matches_single_step_ragged_tail():
    """Padded tail batches give microbatches UNEQUAL valid counts; the
    valid-count-weighted combine must still reproduce the accum=1 batched
    masked-mean loss and gradient exactly (averaging per-microbatch means
    would weight a lone valid bag in one microbatch 4x)."""
    eng1, params, opt_state, batch = _setup(1)
    eng4, params4, opt_state4, _ = _setup(4)
    # 5 valid bags: microbatches of 2 get valid counts 2, 2, 1, 0
    valid = jnp.asarray([True] * 5 + [False] * 3)
    batch = dict(batch, valid=valid)
    key = jax.random.PRNGKey(3)
    p1, _, l1, _ = eng1.train_step()(params, opt_state, batch, key)
    p4, _, l4, _ = eng4.train_step()(params4, opt_state4, batch, key)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
