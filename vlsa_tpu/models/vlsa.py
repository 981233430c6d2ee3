"""VLSA top-level model: ordinal text prototypes x language-guided MIL.

Behavioural port of ref model/vlsa.py:21-198 as one Flax module:

    text_features  = prompt path (CoOp plain/rank through the frozen text
                     tower, or PromptAdapter heads, or precomputed constants)
    image_features = MIL encoder over the patch bag (VLFAN with text queries,
                     ABMIL, ..., or FeatMIL for zero-shot)
    logits         = logit_scale.exp() * norm(img) @ norm(text)^T

In zero-shot mode (FeatMIL identity) per-patch logits are aggregated with
MI-Zero logit pooling (ref model/vlsa.py:188-196, deepmil.py:16-37).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masked import l2_normalize
from .mil import DeepMIL, FeatMIL, VLFAN, logit_pooling

Array = jax.Array

CLIP_LOGIT_SCALE_INIT = float(np.log(1.0 / 0.07))


class VLSA(nn.Module):
    """Assembled vision-language survival model.

    Submodule templates are provided by `vlsa_build.build_vlsa` — they carry
    any host-built constants (prompt templates, frozen text features).
    """
    prompt_encoder: Optional[nn.Module] = None   # the text tower
    mil_encoder: Optional[nn.Module] = None
    prompt_learner: Optional[nn.Module] = None   # CoOp plain/rank
    prompt_adapter: Optional[nn.Module] = None   # Adapter-style learner
    query_adapter: Optional[nn.Module] = None    # VLFAN 'Text' query source
    pooling: str = "logit_mean"                  # zero-shot logit pooling
    logit_scale_init: float = CLIP_LOGIT_SCALE_INIT
    pretrained_text_features: Any = None         # np const when prompts frozen
    # static trimmed prompt length: with causal attention the eot/cls readout
    # is identical when trailing padding is dropped, so the tower runs on
    # [K, trim, D] instead of [K, context-1, D] (build_vlsa computes the
    # exact-safe trim: max real length + 1 trailing pad the reference's cls
    # mask attends to, rounded up; None = full length)
    text_trim_len: Any = None

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(self.logit_scale_init, jnp.float32))

    def get_logit_scale(self) -> Array:
        return jnp.exp(self.logit_scale)

    def forward_text_only(self) -> Array:
        """ref model/vlsa.py:158-173."""
        if self.pretrained_text_features is not None:
            return jnp.asarray(self.pretrained_text_features)
        if self.prompt_learner is not None:
            sentence_embeds = self.prompt_learner()
            pseudo = jnp.asarray(self.prompt_learner.pseudo_sentence_tokens)
            if self.text_trim_len is not None:
                sentence_embeds = sentence_embeds[:, :self.text_trim_len]
                pseudo = pseudo[:, :self.text_trim_len]
            return self.prompt_encoder(prompts_embedding=sentence_embeds,
                                   prompts_pseudo_tokens=pseudo)
        if self.prompt_adapter is not None:
            return self.prompt_adapter()
        raise ValueError("no text path configured")

    def encode_text(self, token_ids: Array) -> Array:
        """Encode raw token ids through the text tower (host precompute path)."""
        return self.prompt_encoder(prompts_text=token_ids)

    def get_query(self) -> Optional[Array]:
        if self.query_adapter is not None:
            return self.query_adapter()
        return None

    def query_div_loss(self, **kws) -> Array:
        """Network-owned prompt-diversity regulariser, bound to the QueryDiv
        loss by the runner (ref runner/vlsa_handler.py:181-187)."""
        q = self.get_query()
        return self.mil_encoder.query_div_loss(query=q, **kws)

    def text_precompute(self):
        """(text_features, query) for a FIXED parameter set — the eval loop
        computes these once per pass instead of once per batch (the text
        branch is loop-invariant during evaluation; bit-identical results).
        `query` is None for non-Text-query MIL encoders."""
        return self.forward_text_only(), self.get_query()

    # engine checks this to thread int8 per-patch dequant scales through
    accepts_x_scale = True

    def encode_instances(self, X, mask=None, train: bool = False,
                         ret_with_attn: bool = False, query=None, x_scale=None,
                         x_inv=None):
        kwargs = {}
        if isinstance(self.mil_encoder, VLFAN) and self.mil_encoder.query == "Text":
            kwargs["query"] = self.get_query() if query is None else query
        if isinstance(self.mil_encoder, VLFAN):
            kwargs["x_scale"] = x_scale
            kwargs["x_inv"] = x_inv
        elif isinstance(self.mil_encoder, DeepMIL):
            # ABMIL-family consumes int8 natively too (ops/abmil q8 kernels)
            kwargs["x_scale"] = x_scale
        elif x_scale is not None:
            # remaining encoders consume dequantized features
            from ..ops.coattn import dequantize_feats
            X = dequantize_feats(X, x_scale).astype(jnp.bfloat16)
        if isinstance(self.mil_encoder, FeatMIL):
            return self.mil_encoder(X, mask)
        return self.mil_encoder(X, mask, train=train, ret_with_attn=ret_with_attn, **kwargs)

    def __call__(self, X, mask=None, train: bool = False,
                 text_features=None, query=None, x_scale=None, x_inv=None):
        """X [B, N, D], mask [B, N] -> (logits [B, K], img_feats, text_feats).

        `text_features` / `query` override the text branch with values from
        `text_precompute` (eval-loop caching); None = compute them here.
        `x_scale` [B, N]: per-patch dequant scales for int8-stored X
        (feats_dtype: int8)."""
        if text_features is None:
            text_features = self.forward_text_only()
        text_n = l2_normalize(text_features, axis=-1)        # [K, E]

        image_features = self.encode_instances(X, mask, train=train, query=query,
                                               x_scale=x_scale, x_inv=x_inv)
        scale = self.get_logit_scale()

        if image_features.ndim == 3:
            # zero-shot: per-patch logits + MI-Zero pooling
            img_n = l2_normalize(image_features, axis=-1)    # [B, N, E]
            patch_logits = scale * jnp.einsum("bne,ke->bnk", img_n, text_n)
            _, logits = logit_pooling(patch_logits, self.pooling, mask)
        else:
            img_n = l2_normalize(image_features, axis=-1)    # [B, E]
            logits = scale * img_n @ text_n.T                # [B, K]
        return logits, image_features, text_features
