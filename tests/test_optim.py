"""Optimizer-factory parity: our 'adam' chain must reproduce torch.optim.Adam
(coupled L2 weight decay) with timm's no-decay split, and freezing must zero
updates for frozen subtrees."""
import numpy as np
import jax
import jax.numpy as jnp

from vlsa_tpu.optim import create_optimizer
from vlsa_tpu.optim.factory import decay_mask, frozen_mask_from_cfg

RNG = np.random.default_rng(0)


def test_adam_matches_torch_coupled_l2():
    import torch
    W = RNG.normal(size=(4, 3)).astype(np.float32)
    b = RNG.normal(size=(3,)).astype(np.float32)
    gW = RNG.normal(size=(4, 3)).astype(np.float32)
    gb = RNG.normal(size=(3,)).astype(np.float32)
    lr, wd = 1e-2, 1e-2

    tw = torch.nn.Parameter(torch.tensor(W))
    tb = torch.nn.Parameter(torch.tensor(b))
    # timm split: 2-D params decay, 1-D params don't (ref optim_factory.py:25-37)
    opt = torch.optim.Adam([
        {"params": [tw], "weight_decay": wd},
        {"params": [tb], "weight_decay": 0.0},
    ], lr=lr)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(gW)
        tb.grad = torch.tensor(gb)
        opt.step()

    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    grads = {"W": jnp.asarray(gW), "b": jnp.asarray(gb)}
    tx = create_optimizer("adam", lr, wd, params)
    state = tx.init(params)
    import optax
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["W"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_decay_mask_split():
    params = {"w": jnp.zeros((3, 3)), "bias": jnp.zeros((3,)), "s": jnp.zeros(())}
    m = decay_mask(params)
    assert m["w"] is True or m["w"] == True  # noqa: E712
    assert not m["bias"] and not m["s"]


def test_frozen_subtree_gets_zero_updates():
    params = {"enc": {"k": jnp.ones((2, 2))}, "head": {"k": jnp.ones((2, 2))}}
    frozen = frozen_mask_from_cfg(params, ["enc"])
    assert frozen["enc"]["k"] and not frozen["head"]["k"]
    tx = create_optimizer("adam", 0.1, 0.0, params, frozen=frozen)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["enc"]["k"]).max()) == 0.0
    assert float(jnp.abs(updates["head"]["k"]).max()) > 0.0


def test_frozen_nested_path():
    params = {"pl": {"context_embeds": jnp.ones((2,)), "rank_embeds": jnp.ones((2,))}}
    frozen = frozen_mask_from_cfg(params, ["pl/context_embeds"])
    assert frozen["pl"]["context_embeds"] and not frozen["pl"]["rank_embeds"]


def test_other_optimizers_run():
    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.ones((4, 4))}
    import optax
    for name in ("adamw", "sgd", "momentum", "nadam", "radam", "adadelta",
                 "rmsprop", "adafactor"):
        tx = create_optimizer(name, 1e-3, 1e-4, params)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(new["w"])).all(), name
