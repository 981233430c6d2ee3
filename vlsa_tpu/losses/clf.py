"""Classification losses (pure JAX), mirroring ref loss/loss_clf.py semantics:
binary cross-entropy with smoothing/thresholding, label-smoothing CE, and
soft-target CE.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _smooth_one_hot(target: Array, num_classes: int, smoothing: float, dtype) -> Array:
    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    one_hot = jax.nn.one_hot(target.reshape(-1).astype(jnp.int32), num_classes, dtype=dtype)
    return one_hot * (on_value - off_value) + off_value


def binary_cross_entropy(
    x: Array,
    target: Array,
    smoothing: float = 0.1,
    target_threshold: Optional[float] = None,
    weight: Optional[Array] = None,
    pos_weight: Optional[Array] = None,
    ret_mean: bool = True,
) -> Array:
    """BCE-with-logits with optional dense->one-hot smoothing (ref loss_clf.py:11-48)."""
    if target.shape != x.shape:
        target = _smooth_one_hot(target, x.shape[-1], smoothing, x.dtype)
    if target_threshold is not None:
        target = (target > target_threshold).astype(x.dtype)
    log_p = jax.nn.log_sigmoid(x)
    log_not_p = jax.nn.log_sigmoid(-x)
    pw = 1.0 if pos_weight is None else pos_weight
    loss = -(pw * target * log_p + (1.0 - target) * log_not_p)
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss) if ret_mean else loss


def label_smoothing_cross_entropy(
    x: Array,
    target: Array,
    smoothing: float = 0.1,
    weight: Optional[Array] = None,
    ret_mean: bool = True,
) -> Array:
    """NLL with label smoothing (ref loss_clf.py:51-71)."""
    logprobs = jax.nn.log_softmax(x, axis=-1)
    nll = -jnp.take_along_axis(logprobs, target.reshape(-1, 1).astype(jnp.int32), axis=1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss) if ret_mean else loss


def soft_target_cross_entropy(
    x: Array,
    target: Array,
    smoothing: float = 0.1,
    weight: Optional[Array] = None,
    ret_mean: bool = True,
) -> Array:
    """CE with (smoothed) soft labels (ref loss_clf.py:74-103)."""
    if target.shape != x.shape:
        target = _smooth_one_hot(target, x.shape[-1], smoothing, x.dtype)
    logprobs = jax.nn.log_softmax(x, axis=-1)
    if weight is not None:
        loss = jnp.sum(-target * weight * logprobs, axis=-1)
    else:
        loss = jnp.sum(-target * logprobs, axis=-1)
    return jnp.mean(loss) if ret_mean else loss
