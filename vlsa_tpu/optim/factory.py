"""Optimizer factory (optax) with timm-style weight-decay splitting and
parameter freezing.

Mirrors ref optim/optim_factory.py:25-129 semantics:
  * parameters with ndim <= 1 (biases, norms, scalars) get no weight decay,
  * torch-Adam-style *coupled* L2 (decay added to the gradient before the
    moment update) for `adam`, decoupled for `adamw`,
  * the reference freezes modules by requires_grad=False
    (ref utils/func.py:155-176); here frozen subtrees get zero updates via a
    label mask.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> dict:
    """True where weight decay applies, matching timm's split EXACTLY
    (ref optim_factory.py:25-37): no-decay iff `len(param.shape) == 1` or
    the name ends with ".bias" (flax biases are 1-D, so the shape test
    covers them).  Note scalars (ndim 0, e.g. logit_scale /
    coattn_logit_scale) fall in the DECAY group in the reference — the
    K-step trajectory parity test (tests/test_train_trajectory.py) pins
    this."""
    return jax.tree.map(lambda p: jnp.ndim(p) != 1, params)


def _base_tx(opt_name: str, lr: float, weight_decay: float, params, **kws):
    opt_name = opt_name.lower()
    mask = decay_mask(params)
    wd = weight_decay or 0.0
    eps = kws.get("opt_eps") or 1e-8
    betas = kws.get("opt_betas") or (0.9, 0.999)
    momentum = kws.get("momentum") or 0.9

    if opt_name in ("adam",):
        # torch.optim.Adam(weight_decay=wd): L2 added to gradient pre-moments
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
            optax.scale(-lr),
        )
    if opt_name in ("adamw",):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=wd, mask=mask)
    if opt_name in ("sgd", "nesterov"):
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.sgd(lr, momentum=momentum, nesterov=True),
        )
    if opt_name == "momentum":
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.sgd(lr, momentum=momentum, nesterov=False),
        )
    if opt_name == "nadam":
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.nadam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    if opt_name == "radam":
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    if opt_name == "adadelta":
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.adadelta(lr),
        )
    if opt_name == "adafactor":
        return optax.adafactor(lr)
    if opt_name in ("novograd", "nvnovograd"):
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.novograd(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    if opt_name in ("rmsprop", "rmsproptf"):
        return optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            optax.rmsprop(lr, decay=0.9, eps=eps, momentum=momentum),
        )
    if opt_name == "adamp":
        from .extra import adamp
        return adamp(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd,
                     delta=kws.get("delta", 0.1),
                     wd_ratio=kws.get("wd_ratio", 0.1), mask=mask)
    if opt_name == "sgdp":
        from .extra import sgdp
        return sgdp(lr, momentum=momentum, eps=eps, weight_decay=wd,
                    delta=kws.get("delta", 0.1),
                    wd_ratio=kws.get("wd_ratio", 0.1), mask=mask)
    if opt_name == "adahessian":
        from .extra import scale_by_adahessian
        return optax.with_extra_args_support(optax.chain(
            optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
            scale_by_adahessian(b1=betas[0], b2=betas[1], eps=eps,
                                hessian_power=kws.get("hessian_power", 1.0)),
            optax.scale(-lr),
        ))
    raise ValueError(f"Invalid optimizer: {opt_name}")


def create_optimizer(opt_name: str, lr: float, weight_decay: float, params,
                     frozen: Optional[dict] = None, **kws) -> optax.GradientTransformation:
    """Build the optimizer; `frozen` is a pytree of bools (True = frozen).

    Wrapped in inject_hyperparams so the host-side ReduceLROnPlateau can
    rescale the learning rate inside the compiled step.
    """
    opt_name_l = opt_name.lower()
    parts = opt_name_l.split("_")
    use_lookahead = len(parts) > 1 and parts[0] == "lookahead"
    base_name = "_".join(parts[1:]) if use_lookahead else opt_name_l

    def make(learning_rate):
        tx = _base_tx(base_name, learning_rate, weight_decay, params, **kws)
        if use_lookahead:
            # timm-style 'lookahead_<opt>' names (ref optim_factory.py:117-129)
            from .extra import lookahead
            tx = lookahead(tx, k=kws.get("lookahead_k", 6),
                           alpha=kws.get("lookahead_alpha", 0.5))
        if frozen is not None:
            if base_name == "adahessian":
                # multi_transform can't route the hessian_diag extra arg;
                # zero the frozen leaves after the fact instead
                tx = optax.with_extra_args_support(optax.chain(
                    tx, optax.masked(optax.set_to_zero(), frozen)))
            else:
                labels = jax.tree.map(lambda f: "frozen" if f else "train", frozen)
                tx = optax.multi_transform(
                    {"train": tx, "frozen": optax.set_to_zero()}, labels)
        return tx

    return optax.inject_hyperparams(lambda learning_rate: make(learning_rate))(
        learning_rate=lr)


def frozen_mask_from_cfg(params, frozen_paths) -> dict:
    """Pytree of bools marking frozen subtrees by top-level (or nested
    'a/b') path names — the runner derives these from the reference's
    freeze flags (ref runner/vlsa_handler.py:126-149)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        parts = []
        for p in path:
            key = getattr(p, "key", None)
            parts.append(str(key) if key is not None else str(p))
        return "/".join(parts)

    frozen_leaves = {}
    for path, leaf in flat:
        ps = path_str(path)
        frozen_leaves[ps] = any(ps == fp or ps.startswith(fp + "/")
                                for fp in frozen_paths)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [frozen_leaves[path_str(p)] for p, _ in flat])
