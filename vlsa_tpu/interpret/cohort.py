"""Cohort-level interpretation: batched Shapley attribution over a test split.

BASELINE.json config 4 ("Batched Shapley-values interpretation over TCGA-BLCA
test split"): for every patient, compute the decoupled prior-by-bin
similarities and the exact Shapley attribution — the per-patient 2^P
coalition enumerations run as one vmapped batch on device (the reference
loops patients AND coalitions in Python, ref utils/model_inference.py:23-79).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BagBatcher
from ..ops.masked import l2_normalize
from .shapley import batched_shapley


def interpret_cohort(model, params, dataset, batch_size: int = 16,
                     min_bucket: int = 256, save_path: Optional[str] = None):
    """Returns a dict with per-patient decoupled similarities [B, P, K],
    Shapley importances [B, P], and incidence probs [B, K]."""
    variables = {"params": params}
    logit_scale = float(np.exp(np.asarray(params["logit_scale"])))
    text = model.apply(variables, method=model.forward_text_only)
    norm_text = l2_normalize(text, axis=-1)                       # [K, E]
    mil = model.mil_encoder

    @jax.jit
    def batch_decoupled(feats, mask):
        def _run(m):
            img, attn = m.encode_instances(feats, mask, ret_with_attn=True)
            A = attn[0] if isinstance(attn, tuple) else attn      # [B, P, N]
            enc = m.mil_encoder.visual_adapter(feats)             # [B, N, D]
            L_img = jnp.linalg.norm(img, axis=-1)                 # [B]
            norm_enc = enc / L_img[:, None, None]
            dec = jnp.einsum("bpn,bnk->bpk", A,
                             norm_enc @ norm_text.T)              # [B, P, K]
            probs = jax.nn.softmax(
                logit_scale * (img / L_img[:, None]) @ norm_text.T, axis=-1)
            return dec, probs
        return model.apply(variables, method=_run)

    batcher = BagBatcher(dataset, batch_size=batch_size, shuffle=False,
                         min_bucket=min_bucket, prefetch=2)
    all_dec, all_shap, all_probs, all_uid = [], [], [], []
    for batch in batcher:
        dec, probs = batch_decoupled(jnp.asarray(batch["feats"]),
                                     jnp.asarray(batch["mask"]))
        shap = batched_shapley(dec, logit_scale)
        valid = batch["valid"]
        all_dec.append(np.asarray(dec)[valid])
        all_shap.append(np.asarray(shap)[valid])
        all_probs.append(np.asarray(probs)[valid])
        all_uid += [dataset.uid[i] for i in batch["idx"][valid]]

    out = {
        "uid": all_uid,
        "decoupled_similarity": np.concatenate(all_dec),
        "shap_importance": np.concatenate(all_shap),
        "probs": np.concatenate(all_probs),
    }
    if save_path:
        import pandas as pd
        P = out["shap_importance"].shape[1]
        df = pd.DataFrame(out["shap_importance"],
                          columns=[f"shap_prior_{i}" for i in range(P)])
        df.insert(0, "patient_id", out["uid"])
        K = out["probs"].shape[1]
        for k in range(K):
            df[f"incidence_{k}"] = out["probs"][:, k]
        df.to_csv(save_path, index=False)
        print(f"[interpret] wrote cohort attribution to {save_path}")
    return out
