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
