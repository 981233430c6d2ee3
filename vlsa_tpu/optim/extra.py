"""Projection / lookahead / second-order optimizers from the reference's
vendored timm set (ref optim/adamp.py, sgdp.py, lookahead.py,
adahessian.py), re-derived as optax transforms.

The reference vendors the official torch implementations; none of its
shipped configs use them, but the capability surface is part of §2.5.
Semantics:

* AdamP / SGDP (NAVER, "Slowing Down the Slide on the Scale-Invariance"):
  Adam/SGD-momentum whose perturbation is projected onto the tangent space
  of the weight norm whenever the gradient is nearly orthogonal to the
  weights (channel- or layer-wise cosine test), and weight decay is scaled
  by `wd_ratio` on projected tensors.  The torch version's data-dependent
  `if cosine < delta/sqrt(dim)` becomes `jnp.where` — jit-stable.
* Lookahead (k slow steps, alpha interpolation) as a wrapper transform whose
  state carries the slow weights.
* AdaHessian: Adam-like with the Hutchinson estimate of the Hessian
  diagonal in place of the squared gradient; the estimate is supplied per
  step via the `hessian_diag` extra arg (compute it with
  `hutchinson_hessian_diag`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------- AdamP


def _channel_cosine(g, p, eps=1e-8):
    """Per-channel |cos| between g and p viewed as [C, -1]; returns max
    (ref adamp.py `_cosine_similarity`: eps added to each norm)."""
    gv = g.reshape(g.shape[0], -1)
    pv = p.reshape(p.shape[0], -1)
    num = jnp.abs(jnp.sum(gv * pv, axis=1))
    den = (jnp.linalg.norm(gv, axis=1) + eps) * (jnp.linalg.norm(pv, axis=1) + eps)
    return jnp.max(num / den), gv.shape[1]


def _layer_cosine(g, p, eps=1e-8):
    gv = g.reshape(1, -1)
    pv = p.reshape(1, -1)
    num = jnp.abs(jnp.sum(gv * pv))
    den = (jnp.linalg.norm(gv) + eps) * (jnp.linalg.norm(pv) + eps)
    return num / den, gv.shape[1]


def _project_view(perturb, p, view, eps=1e-8):
    """Remove the weight-norm direction from `perturb` in the given view
    (ref adamp.py `_projection` body)."""
    if view == "channel":
        pv = p.reshape(p.shape[0], -1)
        perturb_v = perturb.reshape(p.shape[0], -1)
        p_n = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        out = perturb_v - p_n * jnp.sum(p_n * perturb_v, axis=1, keepdims=True)
    else:
        pv = p.reshape(1, -1)
        perturb_v = perturb.reshape(1, -1)
        p_n = pv / (jnp.linalg.norm(pv) + eps)
        out = perturb_v - p_n * jnp.sum(p_n * perturb_v)
    return out.reshape(perturb.shape)


def _adamp_projection(g, p, perturb, delta, wd_ratio):
    """ref optim/adamp.py `_projection`: try channel view, then layer view;
    on a hit, project the perturbation and scale weight decay."""
    if jnp.ndim(p) < 2:
        return perturb, jnp.asarray(1.0, p.dtype)
    cos_ch, dim_ch = _channel_cosine(g, p)
    cos_ly, dim_ly = _layer_cosine(g, p)
    hit_ch = cos_ch < delta / jnp.sqrt(float(dim_ch))
    hit_ly = jnp.logical_and(~hit_ch, cos_ly < delta / jnp.sqrt(float(dim_ly)))
    proj_ch = _project_view(perturb, p, "channel")
    proj_ly = _project_view(perturb, p, "layer")
    out = jnp.where(hit_ch, proj_ch, jnp.where(hit_ly, proj_ly, perturb))
    ratio = jnp.where(jnp.logical_or(hit_ch, hit_ly), wd_ratio, 1.0)
    return out, ratio.astype(p.dtype)


class ScaleByAdamPState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = False,
          mask=None) -> optax.GradientTransformation:
    """ref optim/adamp.py (official AdamP)."""

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdamPState(jnp.zeros([], jnp.int32), zeros(), zeros())

    def update(grads, state, params):
        assert params is not None, "adamp requires params"
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def one(p, g, m, v, use_wd):
            # ref adamp.py step: denom = sqrt(v)/sqrt(b2c)+eps,
            # step_size = lr/b1c, multiplicative wd p*=(1-lr*wd*ratio)
            denom = jnp.sqrt(v) / jnp.sqrt(b2c) + eps
            perturb = ((b1 * m + (1 - b1) * g) if nesterov else m) / denom
            perturb, ratio = _adamp_projection(g, p, perturb, delta, wd_ratio)
            wd_term = (weight_decay * ratio * p) if (weight_decay and use_wd) else 0.0
            return -learning_rate * (perturb / b1c + wd_term)

        wd_mask = mask if mask is not None else jax.tree.map(lambda _: True, params)
        updates = jax.tree.map(one, params, grads, mu, nu, wd_mask)
        return updates, ScaleByAdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def sgdp(learning_rate: float, momentum: float = 0.9, eps: float = 1e-8,
         weight_decay: float = 0.0, delta: float = 0.1, wd_ratio: float = 0.1,
         nesterov: bool = True, mask=None) -> optax.GradientTransformation:
    """ref optim/sgdp.py (official SGDP)."""

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, state, params):
        assert params is not None, "sgdp requires params"
        buf = jax.tree.map(lambda b, g: momentum * b + g, state, grads)

        def one(p, g, b, use_wd):
            d_p = g + momentum * b if nesterov else b
            d_p, ratio = _adamp_projection(g, p, d_p, delta, wd_ratio)
            # ref sgdp.py: p *= (1 - lr*wd*ratio/(1-momentum)) before the step
            wd_term = (weight_decay * ratio * p / (1 - momentum)) \
                if (weight_decay and use_wd) else 0.0
            return -learning_rate * (d_p + wd_term)

        wd_mask = mask if mask is not None else jax.tree.map(lambda _: True, params)
        updates = jax.tree.map(one, params, grads, buf, wd_mask)
        return updates, buf

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------------------- Lookahead


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jax.Array


def lookahead(inner: optax.GradientTransformation, k: int = 6,
              alpha: float = 0.5) -> optax.GradientTransformation:
    """ref optim/lookahead.py: every k fast steps, pull the slow weights
    toward the fast ones (slow += alpha*(fast-slow)) and reset fast=slow."""

    def init(params):
        return LookaheadState(inner.init(params),
                              jax.tree.map(jnp.asarray, params),
                              jnp.zeros([], jnp.int32))

    def update(grads, state, params):
        assert params is not None, "lookahead requires params"
        u, inner_state = inner.update(grads, state.inner, params)
        fast = optax.apply_updates(params, u)
        count = state.count + 1
        sync = (count % k == 0)
        # ref lookahead.py update_slow: the slow buffer is lazily created at
        # the FIRST sync from the then-current fast weights (first sync is a
        # no-op), not from the init-time params
        first = (count == k)
        slow_base = jax.tree.map(
            lambda s, f: jnp.where(first, f, s), state.slow, fast)
        slow_new = jax.tree.map(
            lambda s, f: jnp.where(sync, s + alpha * (f - s), s),
            slow_base, fast)
        final = jax.tree.map(
            lambda f, s, p: jnp.where(sync, s - p, f - p),
            fast, slow_new, params)
        return final, LookaheadState(inner_state, slow_new, count)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------- AdaHessian


class ScaleByAdaHessianState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adahessian(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                        hessian_power: float = 1.0
                        ) -> optax.GradientTransformationExtraArgs:
    """ref optim/adahessian.py: Adam-structure with the (spatially averaged)
    Hutchinson Hessian-diagonal estimate as the second moment.  The per-step
    estimate arrives via the `hessian_diag` extra argument."""

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdaHessianState(jnp.zeros([], jnp.int32), zeros(), zeros())

    def update(grads, state, params=None, *, hessian_diag=None, **extra):
        assert hessian_diag is not None, (
            "adahessian needs the `hessian_diag` extra arg "
            "(see optim.extra.hutchinson_hessian_diag)")
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, h: b2 * v + (1 - b2) * h * h,
                          state.nu, hessian_diag)
        updates = jax.tree.map(
            lambda m, v: (m / b1c) / ((jnp.sqrt(v / b2c) ** hessian_power) + eps),
            mu, nu)
        return updates, ScaleByAdaHessianState(count, mu, nu)

    return optax.GradientTransformationExtraArgs(init, update)


def hutchinson_hessian_diag(loss_fn, params, rng, spatial_average: bool = True):
    """One-sample Hutchinson estimate z .* (H z) of the Hessian diagonal
    (ref adahessian.py get_trace), z Rademacher; conv-style >=2-D tensors
    optionally row-averaged like the torch implementation."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    z = jax.tree_util.tree_unflatten(treedef, [
        jax.random.rademacher(k, shape=l.shape, dtype=l.dtype)
        for k, l in zip(keys, leaves)])
    _, hz = jax.jvp(jax.grad(loss_fn), (params,), (z,))
    diag = jax.tree.map(lambda zi, hi: zi * hi, z, hz)
    if spatial_average:
        def avg(d):
            if jnp.ndim(d) >= 2:
                axes = tuple(range(1, jnp.ndim(d)))
                return jnp.mean(jnp.abs(d), axis=axes, keepdims=True) \
                    * jnp.ones_like(d)
            return d
        diag = jax.tree.map(avg, diag)
    return diag
