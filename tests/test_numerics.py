"""Numerical-stability battery: extreme logit scales, degenerate batches,
gradient finiteness — the regimes the reference hits in practice
(coattn scale 100, logit_scale up to e^4.6, single-bag batches)."""
import numpy as np
import jax
import jax.numpy as jnp

from vlsa_tpu.losses import surv_emd, surv_ifmle, surv_t2i
from vlsa_tpu.ops.coattn import coattn_pool_reference

RNG = np.random.default_rng(0)


def test_emd_extreme_logit_scale():
    probs = jnp.asarray(RNG.dirichlet(np.ones(12), size=4).astype(np.float32))
    t = jnp.asarray([0, 5, 11, 3])
    e = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    for ls in (1.0, 100.0, 1000.0):
        v = float(surv_emd(probs, t, e, ls))
        assert np.isfinite(v), ls


def test_ifmle_tiny_probs_grad_finite():
    logits = jnp.asarray(RNG.normal(size=(3, 8)).astype(np.float32) * 50)

    def loss(lg):
        p = jax.nn.softmax(lg, -1)
        return surv_ifmle(p, jnp.asarray([0, 7, 3]), jnp.asarray([1.0, 1.0, 0.0]))

    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_t2i_single_sample_batch():
    logits = jnp.asarray(RNG.normal(size=(1, 6)).astype(np.float32))
    v = float(surv_t2i(logits, jnp.asarray([2]), jnp.asarray([1.0]), 10.0))
    assert np.isfinite(v)
    # all-censored single sample: most bins drop out but must stay finite
    v2 = float(surv_t2i(logits, jnp.asarray([2]), jnp.asarray([0.0]), 10.0))
    assert np.isfinite(v2)


def test_coattn_sharp_softmax_grads():
    """scale 100 on cosine sims: near-one-hot attention, grads stay finite."""
    q = jnp.asarray(RNG.normal(size=(4, 16)).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(2, 64, 16)).astype(np.float32))
    mask = jnp.ones((2, 64), bool)

    def loss(q_, x_):
        return jnp.sum(coattn_pool_reference(q_, x_, mask, 100.0) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(q, x)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_coattn_zero_row_bag():
    """A bag containing all-zero patch rows must not produce NaNs."""
    q = jnp.asarray(RNG.normal(size=(3, 8)).astype(np.float32))
    x = jnp.zeros((1, 32, 8), jnp.float32)
    out = coattn_pool_reference(q, x, jnp.ones((1, 32), bool), 10.0)
    assert np.isfinite(np.asarray(out)).all()

    def loss(x_):
        return jnp.sum(coattn_pool_reference(q, x_, jnp.ones((1, 32), bool), 10.0) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_all_padding_bag_row():
    """valid=False rows (fully masked bags) keep losses finite via sample_mask."""
    probs = jnp.asarray(RNG.dirichlet(np.ones(5), size=3).astype(np.float32))
    t = jnp.asarray([0, 1, 0])
    e = jnp.asarray([1.0, 0.0, 1.0])
    sm = jnp.asarray([1.0, 1.0, 0.0])
    assert np.isfinite(float(surv_ifmle(probs, t, e, sample_mask=sm)))
    assert np.isfinite(float(surv_emd(probs, t, e, 100.0, sample_mask=sm)))


def test_scan_tower_matches_unrolled():
    """scan_layers=True (lax.scan over stacked layer params) is numerically
    IDENTICAL to the unrolled tower, for values and gradients, across apis."""
    import jax
    import jax.numpy as jnp
    from vlsa_tpu.models.text_encoder import TextTower, stack_resblock_params

    rng = np.random.default_rng(0)
    for api in ("CONCH", "CLIP"):
        cfg = dict(width=64, heads=4, layers=3, context_length=16,
                   vocab_size=101, output_dim=32, api=api)
        loop = TextTower(**cfg)
        scan = TextTower(scan_layers=True, **cfg)
        K, L = 4, 12
        emb = jnp.asarray(rng.normal(size=(K, L, 64)).astype(np.float32))
        pt = np.zeros((K, L), np.int64)
        for i in range(K):
            n = int(rng.integers(4, L))
            pt[i, :n] = np.arange(n) + 1
        pt = jnp.asarray(pt)
        p_loop = loop.init(jax.random.PRNGKey(0), emb, pt)["params"]
        p_stack = stack_resblock_params(p_loop)
        out_loop = loop.apply({"params": p_loop}, emb, pt)
        out_scan = scan.apply({"params": p_stack}, emb, pt)
        np.testing.assert_array_equal(np.asarray(out_loop), np.asarray(out_scan))

        g_loop = jax.grad(lambda e: jnp.sum(
            loop.apply({"params": p_loop}, e, pt) ** 2))(emb)
        g_scan = jax.grad(lambda e: jnp.sum(
            scan.apply({"params": p_stack}, e, pt) ** 2))(emb)
        # scan transposes accumulate in reverse order -> last-ulp drift
        np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_loop),
                                   rtol=1e-4, atol=1e-5)


def test_scan_tower_precision_cast_and_tp_shardings():
    """cast_frozen_tower_weights and param_shardings understand the stacked
    `blocks` layout (bf16 only on the 3-D matmul weights; TP specs shifted
    one axis right behind the layer axis)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from vlsa_tpu.models.precision import cast_frozen_tower_weights
    from vlsa_tpu.models.text_encoder import TextTower
    from vlsa_tpu.parallel import make_mesh, param_shardings
    import jax.numpy as jnp

    tower = TextTower(width=64, heads=4, layers=3, context_length=16,
                      vocab_size=101, output_dim=32, api="CONCH",
                      scan_layers=True)
    emb = jnp.zeros((2, 12, 64))
    pt = jnp.zeros((2, 12), jnp.int32).at[:, :4].set(jnp.arange(1, 5))
    p = tower.init(jax.random.PRNGKey(0), emb, pt)["params"]
    params = {"prompt_encoder": p}
    cast = cast_frozen_tower_weights(params)["prompt_encoder"]["blocks"]
    assert cast["c_fc_weight"].dtype == jnp.bfloat16
    assert cast["attn"]["in_proj_weight"].dtype == jnp.bfloat16
    assert cast["c_fc_bias"].dtype == jnp.float32
    assert cast["ln_1"]["scale"].dtype == jnp.float32

    mesh = make_mesh(n_data=4, n_model=2)
    sh = param_shardings(params, mesh)["prompt_encoder"]["blocks"]
    assert sh["c_fc_weight"].spec == P(None, "model", None)
    assert sh["c_fc_bias"].spec == P(None, "model")
    assert sh["c_proj_weight"].spec == P(None, None, "model")
    assert sh["attn"]["in_proj_weight"].spec == P()
