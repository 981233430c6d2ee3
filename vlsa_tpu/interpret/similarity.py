"""Decoupled text-image similarity for interpretation.

Behavioural port of ref utils/model_inference.py:81-144: run VLFAN with
attention, then decompose the bag-level text similarity over the P language
priors:  decoupled[p, k] = sum_n A[p, n] * <enc_X[n]/||img||, text_k>.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masked import l2_normalize, masked_softmax


def calc_text_img_similarity(model, params, X, mask=None, axis_softmax: str = "V"):
    """Returns a dict with attention, probabilities, decoupled similarities,
    and Shapley importances for one bag `X [N, D]` (or [1, N, D])."""
    from .shapley import evaluate_prototype_shap_imp

    assert axis_softmax in ("L", "V")
    X = jnp.asarray(X)
    if X.ndim == 2:
        X = X[None]
    if mask is None:
        mask = jnp.ones(X.shape[:2], bool)

    variables = {"params": params}
    logit_scale = float(np.exp(np.asarray(params["logit_scale"])))
    text_features = model.apply(variables, method=model.forward_text_only)
    norm_text = l2_normalize(text_features, axis=-1)          # [K, E]

    mil = model.mil_encoder
    coattn_scale = mil.coattn_logit_scale

    query = model.apply(variables, method=model.get_query)
    q_raw = np.asarray(query) if query is not None else None

    # direct path: model forward with attention
    def _encode(m):
        return m.encode_instances(X, mask, ret_with_attn=True)
    image_feature, attn = model.apply(variables, method=_encode)
    coattn_score = attn[0] if isinstance(attn, tuple) else attn  # [1, P, N]

    L_img = jnp.linalg.norm(image_feature, axis=-1)             # [1]
    norm_img = image_feature / L_img[..., None]
    sim = norm_img @ norm_text.T                                # [1, K]
    probs = jax.nn.softmax(logit_scale * sim, axis=-1)

    # decoupled path (ref model_inference.py:128-134)
    def _adapter(m):
        return m.mil_encoder.visual_adapter(X)
    enc_X = model.apply(variables, method=_adapter)             # [1, N, D]
    norm_enc_X = enc_X[0] / L_img[0]                            # [N, D]
    A = coattn_score[0]                                         # [P, N]
    decoupled = A @ (norm_enc_X @ norm_text.T)                  # [P, K]
    decoupled_imp = jax.nn.softmax(logit_scale * decoupled, axis=0)
    probs2 = jax.nn.softmax(
        logit_scale * jnp.mean(decoupled, axis=0, keepdims=True), axis=-1)

    shap = evaluate_prototype_shap_imp(np.asarray(decoupled), logit_scale)

    # standalone query-vs-patch attention map (ref lines 107-117)
    dim = 0 if axis_softmax == "L" else 1
    if q_raw is not None:
        nq = l2_normalize(jnp.asarray(q_raw), axis=-1)
        nx = l2_normalize(X[0], axis=-1)
        A_qp = jax.nn.softmax(coattn_scale * (nq @ nx.T), axis=dim)
    else:
        A_qp = None

    return {
        "attention": None if A_qp is None else np.asarray(A_qp),
        "coattn_score": np.asarray(A),
        "probs": np.asarray(probs),
        "probs_decoupled": np.asarray(probs2),
        "decoupled_similarity": np.asarray(decoupled),
        "decoupled_imp": np.asarray(decoupled_imp),
        "shap_importance": np.asarray(shap),
        "logit_scale": logit_scale,
    }


def calc_abmil_text_img_similarity(model, params, X, mask=None):
    """ABMIL interpretation variant (ref utils/model_inference.py:146-178):
    for a VLSA assembly whose MIL encoder is the ABMIL family (DeepMIL),
    return the patch attention distribution and the bin probabilities.

    The reference softmaxes the encoder's raw attention scores over patches
    (`F.softmax(attn_score, dim=-1)`); ours is the mask-aware equivalent so
    padded patches get zero mass.

    Returns {'attention' [1, N] softmaxed patch weights, 'probs' [1, K],
    'similarity' [1, K] cosine sims, 'logit_scale' float}."""
    X = jnp.asarray(X)
    if X.ndim == 2:
        X = X[None]
    if mask is None:
        mask = jnp.ones(X.shape[:2], bool)

    variables = {"params": params}
    logit_scale = float(np.exp(np.asarray(params["logit_scale"])))
    text_features = model.apply(variables, method=model.forward_text_only)
    norm_text = l2_normalize(text_features, axis=-1)              # [K, E]

    def _encode(m):
        return m.encode_instances(X, mask, ret_with_attn=True)
    image_feature, raw_attn = model.apply(variables, method=_encode)
    if raw_attn.ndim == 3:                                        # [B, 1, N]
        raw_attn = raw_attn[:, 0]
    attn = masked_softmax(raw_attn, mask, axis=-1)                # [1, N]

    norm_img = l2_normalize(image_feature, axis=-1)               # [1, E]
    sim = norm_img @ norm_text.T                                  # [1, K]
    probs = jax.nn.softmax(logit_scale * sim, axis=-1)
    return {
        "attention": np.asarray(attn),
        "probs": np.asarray(probs),
        "similarity": np.asarray(sim),
        "logit_scale": logit_scale,
    }
