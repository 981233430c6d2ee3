"""Multi-device sharding tests on the virtual 8-CPU mesh: explicit
sequence-parallel co-attention, data-parallel training equivalence, and
tensor-parallel param layouts."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vlsa_tpu.ops.coattn import coattn_pool_reference
from vlsa_tpu.parallel import make_mesh, param_shardings
from vlsa_tpu.parallel.coattn_sp import coattn_pool_sp
import pytest

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(8)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_coattn_sp_matches_single_device():
    mesh = make_mesh(n_data=2, n_model=4)
    B, N, C, Pq = 2, 64, 16, 5
    q = jnp.asarray(RNG.normal(size=(Pq, C)).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(B, N, C)).astype(np.float32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((B, 48)), np.zeros((B, 16))], 1).astype(bool))
    ref = coattn_pool_reference(q, x, mask, 30.0)
    got = coattn_pool_sp(q, x, mask, 30.0, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_param_shardings_tp_layout():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "resblock_0": {"c_fc_weight": np.zeros((64, 16)),
                       "c_fc_bias": np.zeros((64,)),
                       "c_proj_weight": np.zeros((16, 64)),
                       "ln_1": {"scale": np.zeros((16,))}},
        "logit_scale": np.zeros(()),
    }
    sh = param_shardings(params, mesh)
    assert sh["resblock_0"]["c_fc_weight"].spec == P("model", None)
    assert sh["resblock_0"]["c_proj_weight"].spec == P(None, "model")
    assert sh["resblock_0"]["ln_1"]["scale"].spec == P()
    assert sh["logit_scale"].spec == P()


def test_dp_training_matches_single_device():
    """A jitted SGD step with batch sharded over 'data' must equal the
    unsharded step (XLA inserts the gradient all-reduce)."""
    from vlsa_tpu.models import DeepMIL
    import optax

    model = DeepMIL(dim_in=16, dim_hid=8, num_cls=3, use_feat_proj=False,
                    pooling="attention")
    x = jnp.asarray(RNG.normal(size=(8, 32, 16)).astype(np.float32))
    mask = jnp.ones((8, 32), bool)
    t = jnp.asarray(RNG.integers(0, 3, size=8), jnp.int32)
    e = jnp.asarray(RNG.integers(0, 2, size=8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, mask)["params"]
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    from vlsa_tpu.losses import surv_ifmle

    def step(params, opt_state, x, mask, t, e):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, mask)
            return surv_ifmle(jax.nn.softmax(logits, -1), t, e)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    p_single, l_single = jax.jit(step)(params, opt_state, x, mask, t, e)

    mesh = make_mesh(n_data=8, n_model=1)
    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    args = (jax.device_put(params, rep), jax.device_put(opt_state, rep),
            jax.device_put(x, shard), jax.device_put(mask, shard),
            jax.device_put(t, shard), jax.device_put(e, shard))
    p_dp, l_dp = jax.jit(step)(*args)
    np.testing.assert_allclose(float(l_single), float(l_dp), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_handler_mesh_training(tmp_path):
    """Full SA training with cfg mesh over the 8 virtual devices."""
    from test_runner_e2e import base_cfg, make_cohort
    from vlsa_tpu.runner import SAHandler

    table, split = make_cohort(tmp_path, n_patients=24)
    cfg = base_cfg(tmp_path, table, split)
    cfg.update({"mesh": {"data": 8, "model": 1}, "epochs": 1,
                "bp_every_batch": 8})
    handler = SAHandler(cfg)
    metrics = handler.exec()
    assert np.isfinite(dict(metrics["test"])["pred_loss"])
