"""Exact Shapley values over language priors — fully vectorised.

Behavioural port of ref utils/model_inference.py:23-79: the value function of
a coalition S of prognostic priors is the expected survival risk

    v(S) = sum_k (K - k) * softmax(logit_scale * mean_{p in S} sim[p])_k

and the reference enumerates all 2^P coalitions in a Python loop (HOT LOOP 2
per SURVEY.md §3.5).  Here the [2^P, P] membership matrix evaluates every
coalition in ONE batched matmul + softmax, and the Shapley sum becomes a
masked weighted reduction — also vmappable over patients.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=16)
def _coalition_masks(num_p: int) -> np.ndarray:
    """[2^P, P] binary membership, bit i of the index = prior i
    (matches ref int2bin encoding, model_inference.py:36-43)."""
    idx = np.arange(2 ** num_p, dtype=np.uint32)
    return ((idx[:, None] >> np.arange(num_p)[None, :]) & 1).astype(np.float32)


def shapley_values(decoupled_similarity: Array, logit_scale: float) -> Array:
    """Exact Shapley attribution of each prior (ref evaluate_prototype_shap_imp).

    decoupled_similarity: [P, K] prior-by-bin similarities.
    Returns [P] Shapley importances.
    """
    sim = jnp.asarray(decoupled_similarity, jnp.float32)
    num_p, num_k = sim.shape
    masks = jnp.asarray(_coalition_masks(num_p))          # [C, P], C = 2^P
    counts = jnp.sum(masks, axis=1)                       # [C]

    # coalition mean similarity -> risk, all coalitions at once
    mean_sim = (masks @ sim) / jnp.maximum(counts[:, None], 1.0)   # [C, K]
    prob = jax.nn.softmax(logit_scale * mean_sim, axis=-1)
    k_weights = num_k - jnp.arange(num_k, dtype=jnp.float32)
    V = prob @ k_weights                                   # [C]
    V = V.at[0].set(1.0)                                   # empty-set value (ref line 48-50)

    # Shapley weights W[s] = s! (P-s-1)! / P!
    fac = [math.factorial(i) for i in range(num_p + 1)]
    W = jnp.asarray([fac[s] * fac[num_p - s - 1] / fac[num_p]
                     for s in range(num_p)], jnp.float32)  # indexed by |S|

    # for prior i: sum over coalitions j not containing i of
    #   W[|j|] * (V[j + 2^i] - V[j])
    idx = jnp.arange(2 ** num_p, dtype=jnp.uint32)

    def per_prior(i):
        bit = jnp.uint32(1) << i.astype(jnp.uint32)
        not_in = (idx & bit) == 0                          # [C]
        sizes = counts.astype(jnp.int32)
        w = jnp.where(not_in, W[jnp.clip(sizes, 0, num_p - 1)], 0.0)
        gain = V[idx | bit] - V
        return jnp.sum(w * gain)

    return jax.vmap(per_prior)(jnp.arange(num_p))


def evaluate_prototype_shap_imp(decoupled_similarity, logit_scale, verbose=False):
    """Drop-in equivalent of the reference function (numpy in/out)."""
    out = shapley_values(jnp.asarray(np.asarray(decoupled_similarity)),
                         float(logit_scale))
    if verbose:
        print("[SHAP] Sum over SHAP values =", float(jnp.sum(out)))
    return np.asarray(out)


def batched_shapley(decoupled_similarities: Array, logit_scale: float) -> Array:
    """vmapped over patients: [B, P, K] -> [B, P]."""
    return jax.vmap(lambda s: shapley_values(s, logit_scale))(decoupled_similarities)
