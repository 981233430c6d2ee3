"""Survival losses as pure JAX functions over `[B, K]` predictions.

Semantics mirror the reference implementations (ref: loss/loss_surv.py) but
are rewritten as batched, maskable, jit/vmap-friendly functions:

  * discrete labels `t` are int arrays `[B]`, event indicators `e` float `[B]`
    (e=1 uncensored / event observed, e=0 censored),
  * every loss accepts an optional `sample_mask [B]` so padded batches (ragged
    epoch tails under jit) contribute zero weight,
  * reductions are weighted means over valid samples.

No torch anywhere; everything lowers to XLA.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, sample_mask: Optional[Array]) -> Array:
    if sample_mask is None:
        return jnp.mean(x)
    w = sample_mask.astype(x.dtype).reshape(x.shape)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _reduce(x: Array, reduction: str, sample_mask: Optional[Array]) -> Array:
    if reduction == "mean":
        return _masked_mean(x, sample_mask)
    if reduction == "sum":
        if sample_mask is not None:
            x = x * sample_mask.astype(x.dtype).reshape(x.shape)
        return jnp.sum(x)
    if reduction == "none":
        return x
    raise ValueError(f"invalid reduction {reduction!r}")


def surv_mle(
    hazards_hat: Array,
    t: Array,
    e: Array,
    alpha: float = 0.0,
    eps: float = 1e-7,
    cur_alpha: Optional[float] = None,
    sample_mask: Optional[Array] = None,
    reduction: str = "mean",
) -> Array:
    """Discrete-hazard negative log-likelihood (MCAT-style).

    Mirrors ref loss/loss_surv.py:89-124:
      S = cumprod(1 - h); S_padded = [1, S]
      uncensored: -(log S_padded[t] + log h[t]);  censored: -log S_padded[t+1]
      loss = (1-a) * (cen + unc) + a * unc
    """
    B, K = hazards_hat.shape
    t = t.reshape(B).astype(jnp.int32)
    e = e.reshape(B).astype(hazards_hat.dtype)
    c = 1.0 - e
    S = jnp.cumprod(1.0 - hazards_hat, axis=1)
    S_padded = jnp.concatenate([jnp.ones((B, 1), hazards_hat.dtype), S], axis=1)
    s_t = jnp.take_along_axis(S_padded, t[:, None], axis=1)[:, 0]
    h_t = jnp.take_along_axis(hazards_hat, t[:, None], axis=1)[:, 0]
    s_t1 = jnp.take_along_axis(S_padded, t[:, None] + 1, axis=1)[:, 0]
    uncensored = -(1.0 - c) * (jnp.log(jnp.maximum(s_t, eps)) + jnp.log(jnp.maximum(h_t, eps)))
    censored = -c * jnp.log(jnp.maximum(s_t1, eps))
    a = alpha if cur_alpha is None else cur_alpha
    loss = (1.0 - a) * (censored + uncensored) + a * uncensored
    return _reduce(loss, reduction, sample_mask)


def surv_ifmle(
    incidence_hat: Array,
    t: Array,
    e: Array,
    alpha: float = 0.0,
    eps: float = 1e-7,
    cur_alpha: Optional[float] = None,
    sample_mask: Optional[Array] = None,
    reduction: str = "mean",
) -> Array:
    """Incidence-function NLL (DeepHit-style), ref loss/loss_surv.py:127-169.

    `incidence_hat` must already be softmaxed over the K bins.
      CIF = cumsum(incidence)
      uncensored: -log incidence[t];  censored: -log(1 - CIF[t])
    """
    B, K = incidence_hat.shape
    t = t.reshape(B).astype(jnp.int32)
    e = e.reshape(B).astype(incidence_hat.dtype)
    c = 1.0 - e
    cif = jnp.cumsum(incidence_hat, axis=1)
    inc_t = jnp.take_along_axis(incidence_hat, t[:, None], axis=1)[:, 0]
    cif_t = jnp.take_along_axis(cif, t[:, None], axis=1)[:, 0]
    uncensored = -(1.0 - c) * jnp.log(jnp.maximum(inc_t, eps))
    censored = -c * jnp.log(jnp.maximum(1.0 - cif_t, eps))
    a = alpha if cur_alpha is None else cur_alpha
    loss = (1.0 - a) * (censored + uncensored) + a * uncensored
    return _reduce(loss, reduction, sample_mask)


def surv_ple(
    y_hat: Array,
    t: Array,
    e: Array,
    sample_mask: Optional[Array] = None,
) -> Array:
    """Cox partial likelihood (Breslow approximation), ref loss/loss_surv.py:172-209.

    The O(B^2) risk-set matrix is built with broadcasting instead of the
    reference's Python double loop, so it lowers to one outer-compare on TPU.
    """
    theta = y_hat.reshape(-1)
    theta = jnp.minimum(theta, 10.0)  # numerical-overflow clamp, ref line 187-193
    t = t.reshape(-1)
    e = e.reshape(-1).astype(theta.dtype)
    # R[i, j] = 1 if T_j >= T_i  (subject j still at risk at event time of i)
    R = (t[None, :] >= t[:, None]).astype(theta.dtype)
    if sample_mask is not None:
        m = sample_mask.reshape(-1).astype(theta.dtype)
        R = R * m[None, :]
        e = e * m
        denom = jnp.maximum(jnp.sum(m), 1.0)
    else:
        denom = theta.shape[0]
    exp_theta = jnp.exp(theta)
    log_risk = jnp.log(jnp.sum(exp_theta[None, :] * R, axis=1))
    return -jnp.sum((theta - log_risk) * e) / denom


def recon_loss(
    pred_t: Array,
    t: Array,
    e: Array,
    alpha: float = 0.0,
    gamma: float = 1.0,
    norm: str = "l1",
    cur_alpha: Optional[float] = None,
    sample_mask: Optional[Array] = None,
    **_,
) -> Array:
    """Continuous-time reconstruction loss, ref loss/loss_surv.py:11-31."""
    pred_t = pred_t.reshape(-1)
    t = t.reshape(-1).astype(pred_t.dtype)
    e = e.reshape(-1).astype(pred_t.dtype)
    loss_obs = e * jnp.abs(pred_t - t)
    loss_cen = (1.0 - e) * jax.nn.relu(gamma - (pred_t - t))
    if norm == "l2":
        loss_obs = loss_obs * loss_obs
        loss_cen = loss_cen * loss_cen
    loss_recon = loss_obs + loss_cen
    a = alpha if cur_alpha is None else cur_alpha
    loss = (1.0 - a) * loss_recon + a * loss_obs
    return _masked_mean(loss, sample_mask)


def rank_loss(
    pred_t: Array,
    t: Array,
    e: Array,
    gamma: float = 1.0,
    norm: str = "l1",
    add_weight: bool = False,
    sample_mask: Optional[Array] = None,
    **_,
) -> Array:
    """Pairwise ranking loss over comparable pairs, ref loss/loss_surv.py:33-70.

    Pairs (i, j) with e_i=1 and t_i < t_j; hinge on gamma + pred_i - pred_j.
    Returns 0 when no comparable pair exists (branch-free via weight sum).
    """
    pred_t = pred_t.reshape(-1)
    t = t.reshape(-1)
    e = e.reshape(-1)
    pair_mask = (t[:, None] < t[None, :]) & (e[:, None] == 1)
    pair_mask = pair_mask.astype(pred_t.dtype)
    if sample_mask is not None:
        m = sample_mask.reshape(-1).astype(pred_t.dtype)
        pair_mask = pair_mask * m[:, None] * m[None, :]
    pair_diff = pred_t[:, None] - pred_t[None, :]
    pair_loss = jax.nn.relu(gamma + pair_diff)
    if norm == "l2":
        pair_loss = pair_loss * pair_loss
    elif norm != "l1":
        raise NotImplementedError(f"norm must be l1/l2, got {norm}")
    if add_weight:
        # masked log-softmax over pair differences (ref lines 52-57)
        x = pair_diff
        maxx = jnp.max(x * pair_mask + (1.0 - 1.0 / (pair_mask + 1e-5)))
        log_ex = x - maxx
        log_softmax = log_ex - jnp.log(jnp.sum(jnp.exp(log_ex * pair_mask) * pair_mask))
        normed_weight = jnp.exp(log_softmax * pair_mask) * pair_mask
    else:
        wsum = jnp.sum(pair_mask)
        normed_weight = pair_mask / jnp.maximum(wsum, 1e-12)
        # when no comparable pair exists, all weights are 0 -> loss = 0
    return jnp.sum(pair_loss * normed_weight)


def mse_loss(
    pred_t: Array,
    t: Array,
    e: Array,
    include_censored: bool = False,
    sample_mask: Optional[Array] = None,
    **_,
) -> Array:
    """Event-only (optionally all-sample) MSE, ref loss/loss_surv.py:72-86."""
    pred_t = pred_t.reshape(-1)
    t = t.reshape(-1).astype(pred_t.dtype)
    e = e.reshape(-1).astype(pred_t.dtype)
    loss = e * (pred_t - t) ** 2
    if include_censored:
        loss = loss + (1.0 - e) * (pred_t - t) ** 2
    return _masked_mean(loss, sample_mask)
