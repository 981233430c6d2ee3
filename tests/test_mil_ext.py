"""Extended MIL zoo: TransMIL (JAX Nystrom), ILRA, DeepAttnMISL, PatchGCN."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlsa_tpu.models import TransMIL, ILRA, DeepAttnMISL, PatchGCN
from vlsa_tpu.models.nystrom import moore_penrose_pinv

RNG = np.random.default_rng(2)


def test_moore_penrose_pinv():
    A = jnp.asarray(RNG.normal(size=(4, 6, 6)).astype(np.float32))
    A = jax.nn.softmax(A, axis=-1)  # well-conditioned row-stochastic
    pinv = moore_penrose_pinv(A, iters=10)
    eye = jnp.eye(6)[None]
    err = jnp.max(jnp.abs(A @ pinv @ A - A))
    assert float(err) < 1e-2


def test_transmil_smoke():
    x = jnp.asarray(RNG.normal(size=(2, 60, 32)).astype(np.float32))
    mask = jnp.asarray(np.concatenate([np.ones((2, 50)), np.zeros((2, 10))], 1).astype(bool))
    model = TransMIL(dim_in=32, dim_hid=64, num_cls=3)
    params = model.init(jax.random.PRNGKey(0), x, mask)["params"]
    out = model.apply({"params": params}, x, mask)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()
    logits, attn = model.apply({"params": params}, x, mask, ret_with_attn=True)
    assert attn.shape == (2, 60)


def test_ilra_smoke_and_mask():
    x = jnp.asarray(RNG.normal(size=(2, 40, 24)).astype(np.float32))
    model = ILRA(dim_in=24, dim_hid=32, num_cls=2, num_layers=2, num_heads=4, topk=1)
    params = model.init(jax.random.PRNGKey(1), x, jnp.ones((2, 40), bool))["params"]
    out_full = model.apply({"params": params}, x, jnp.ones((2, 40), bool))
    assert out_full.shape == (2, 2)
    # padded invariance on the first GAB layer's key mask
    x_pad = jnp.concatenate([x, 50.0 * jnp.ones((2, 8, 24))], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 40), bool), jnp.zeros((2, 8), bool)], axis=1)
    out_pad = model.apply({"params": params}, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pad),
                               rtol=5e-4, atol=1e-5)


def test_deepattnmisl_cluster_pooling():
    B, N, D, K = 2, 30, 16, 4
    x = jnp.asarray(RNG.normal(size=(B, N, D)).astype(np.float32))
    cid = jnp.asarray(RNG.integers(0, K, size=(B, N)), jnp.int32)
    mask = jnp.ones((B, N), bool)
    model = DeepAttnMISL(dim_in=D, dim_hid=24, num_cls=1, num_clusters=K)
    params = model.init(jax.random.PRNGKey(2), x, mask=mask, cluster_id=cid)["params"]
    out = model.apply({"params": params}, x, mask=mask, cluster_id=cid)
    assert out.shape == (B, 1)
    # empty cluster handled: force all ids to cluster 0
    out0 = model.apply({"params": params}, x, mask=mask, cluster_id=jnp.zeros_like(cid))
    assert np.isfinite(np.asarray(out0)).all()


def test_patchgcn_smoke():
    N, D = 50, 16
    x = jnp.asarray(RNG.normal(size=(N, D)).astype(np.float32))
    # chain graph both directions
    src = np.concatenate([np.arange(N - 1), np.arange(1, N)])
    dst = np.concatenate([np.arange(1, N), np.arange(N - 1)])
    edge_index = jnp.asarray(np.stack([src, dst]), jnp.int32)
    model = PatchGCN(dim_in=D, dim_hid=24, num_cls=4, num_layers=3)
    params = model.init(jax.random.PRNGKey(3), x, edge_index)["params"]
    out = model.apply({"params": params}, x, edge_index)
    assert out.shape == (1, 4)
    assert np.isfinite(np.asarray(out)).all()
