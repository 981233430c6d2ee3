"""Mask-aware pooling primitives.

Every reduction the reference performs over a bag's patch axis (softmax /
mean / max / top-k; ref model/deepmil.py, model/layers.py) must ignore padded
positions once bags are padded to bucket shapes for jit.  These helpers are
the single source of truth for that masking.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e30


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch.nn.functional.normalize equivalent (norm clamped below by eps).

    Written as sqrt(max(sum(x^2), eps^2)) so the gradient at exactly-zero
    rows is zero (instance-masked patches) instead of NaN — matching torch's
    behaviour; for non-zero rows it is identical to clamping the norm."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm


def masked_softmax(logits: Array, mask: Optional[Array], axis: int = -1) -> Array:
    """Softmax that assigns exactly zero probability to masked positions."""
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    mask = jnp.asarray(mask, dtype=bool)
    neg = jnp.where(mask, 0.0, NEG_INF).astype(logits.dtype)
    probs = jax.nn.softmax(logits + neg, axis=axis)
    return jnp.where(mask, probs, 0.0)


def masked_mean(x: Array, mask: Optional[Array], axis: int) -> Array:
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.asarray(mask, x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    s = jnp.sum(x * m, axis=axis)
    cnt = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return s / cnt


def masked_max(x: Array, mask: Optional[Array], axis: int) -> Array:
    if mask is None:
        return jnp.max(x, axis=axis)
    m = jnp.asarray(mask, bool)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.max(jnp.where(m, x, NEG_INF), axis=axis)


def masked_topk_mean(logits: Array, mask: Optional[Array], topk: int) -> Array:
    """Mean of the top-k per-class logits over valid patches.

    Mirrors ref model/deepmil.py:16-37 (MI-Zero pooling): k is clamped to the
    number of valid patches per bag, branch-free under jit.

    logits: [N, C] (or [B, N, C]); mask: [N] / [B, N].
    Returns [C] / [B, C].
    """
    if logits.ndim == 3:
        return jax.vmap(lambda l, m: masked_topk_mean(l, m, topk))(logits, mask)
    N, C = logits.shape
    if mask is None:
        mask = jnp.ones((N,), bool)
    masked = jnp.where(mask[:, None], logits, NEG_INF)
    k = min(topk, N)
    vals, _ = jax.lax.top_k(masked.T, k)  # [C, k] sorted desc
    n_valid = jnp.sum(mask.astype(jnp.int32))
    take = jnp.minimum(k, jnp.maximum(n_valid, 1))
    w = (jnp.arange(k)[None, :] < take).astype(logits.dtype)  # [1, k]
    return jnp.sum(vals * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
