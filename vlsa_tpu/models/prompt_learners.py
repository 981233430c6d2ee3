"""Ordinal survival prompt learners (CoOp plain/rank) and the PromptAdapter.

Behavioural ports of ref model/prompt_learners/: learnable context embeddings
and per-rank embeddings spliced into a pad/sot/eot sentence-embedding template
(plain_prompt_learner.py:82-120), the rank-interpolated ordinal variant
(rank_prompt_learner.py:100-156), and the frozen-text-feature adapter heads
(prompt_adapter.py:118-149).

The host-side constant construction (templates, pseudo tokens, interpolation
weights, initial embeddings from the tokenizer + embedding table) lives in
`prompt_build.py`; these modules hold the constants and the trainable params,
and their `__call__` is pure-XLA (the reference's per-rank Python loops become
static unrolled dynamic-update-slices — num_ranks is ~4-12).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Adapter, TorchLinear

Array = jax.Array


def _array_init(arr: np.ndarray):
    a = np.asarray(arr)
    return lambda key, shape=None: jnp.asarray(a)


class PlainPromptLearner(nn.Module):
    """ref model/prompt_learners/plain_prompt_learner.py."""
    num_ranks: int
    num_context_tokens: int
    num_tokens_per_rank: Tuple[int, ...]
    rank_tokens_position: str = "tail"
    rank_specific_context: bool = False
    embedding_dim: int = 768
    # host-built constants
    sentence_template: Any = None        # np [num_ranks, L, D]
    pseudo_sentence_tokens: Any = None   # np [num_ranks, L]
    context_init: Any = None             # np or None
    rank_init: Any = None                # np or None

    def _context_shape(self):
        if self.rank_specific_context:
            return (self.num_ranks, self.num_context_tokens, self.embedding_dim)
        return (self.num_context_tokens, self.embedding_dim)

    def _rank_shape(self):
        return (self.num_ranks, max(self.num_tokens_per_rank), self.embedding_dim)

    def setup(self):
        ctx_init = (_array_init(self.context_init) if self.context_init is not None
                    else nn.initializers.normal(0.02))
        rnk_init = (_array_init(self.rank_init) if self.rank_init is not None
                    else nn.initializers.normal(0.02))
        self.context_embeds = self.param("context_embeds", ctx_init, self._context_shape())
        self.rank_embeds = self.param("rank_embeds", rnk_init, self._rank_shape())

    def _rank_rows(self) -> Array:
        return self.rank_embeds

    def _splice(self, context_embeds: Array, rank_rows: Array) -> Array:
        """Insert context+rank embeddings into the sentence template
        (ref plain_prompt_learner.py:82-120)."""
        sentence = jnp.asarray(self.sentence_template)
        out = []
        for i in range(self.num_ranks):
            ntr = self.num_tokens_per_rank[i] if i < len(self.num_tokens_per_rank) \
                else self.num_tokens_per_rank[-1]
            ctx = context_embeds[i]
            rnk = rank_rows[i, :ntr]
            if self.rank_tokens_position == "tail":
                body = jnp.concatenate([ctx, rnk], axis=0)
            elif self.rank_tokens_position == "front":
                body = jnp.concatenate([rnk, ctx], axis=0)
            elif self.rank_tokens_position == "middle":
                half = self.num_context_tokens // 2
                body = jnp.concatenate([ctx[:half], rnk, ctx[half:]], axis=0)
            else:
                raise ValueError(self.rank_tokens_position)
            row = jax.lax.dynamic_update_slice(
                sentence[i], body, (1, 0))
            out.append(row)
        return jnp.stack(out)

    def __call__(self) -> Array:
        ctx = self.context_embeds
        if ctx.ndim == 2:
            ctx = jnp.broadcast_to(ctx[None], (self.num_ranks,) + ctx.shape)
        return self._splice(ctx, self._rank_rows())


class RankPromptLearner(PlainPromptLearner):
    """Ordinal inductive bias: K base rank embeddings interpolated to
    num_ranks bins (ref rank_prompt_learner.py:100-156)."""
    num_base_ranks: int = 4
    interpolation_weights: Any = None    # np [num_ranks, num_base_ranks]

    def _rank_shape(self):
        return (self.num_base_ranks, max(self.num_tokens_per_rank), self.embedding_dim)

    def _rank_rows(self) -> Array:
        w = jnp.asarray(self.interpolation_weights)  # [R, B]
        return jnp.sum(w[..., None, None] * self.rank_embeds[None], axis=1)


def create_interpolation_weights(num_base_ranks: int, num_ranks: int,
                                 interpolation_type: str = "linear") -> np.ndarray:
    """ref rank_prompt_learner.py:100-114."""
    fns = {
        "linear": lambda w, n: 1.0 - w / (n - 1),
        "inv_prop": lambda w, _n, eps=1e-5: 1.0 / (w + eps),
        "normal": lambda w, _n: np.exp(-w * w),
    }
    if interpolation_type not in fns:
        raise ValueError(f"invalid interpolation_type: {interpolation_type}")
    w = np.repeat(np.arange(num_ranks, dtype=np.float32)[:, None], num_base_ranks, axis=1)
    if num_base_ranks == 1:
        base = np.linspace(0, num_ranks - 1, 3, dtype=np.float32)[1:2]
    else:
        base = np.linspace(0, num_ranks - 1, num_base_ranks, dtype=np.float32)
    w = np.abs(w - base[None])
    w = fns[interpolation_type](w, num_ranks)
    return w / w.sum(axis=-1, keepdims=True)


class PromptAdapter(nn.Module):
    """Frozen text features + {default, FC, Adapter, TaskRes} heads
    (ref prompt_adapter.py:11-149).

    `prompt_features` (and optional negative features) are precomputed host
    constants: the init sentences encoded once through the frozen text tower.
    """
    method: str = "default"
    num_prompts: int = 4
    prompt_features: Any = None          # np [P, D]
    neg_prompt_features: Any = None      # np [1, D] or None
    dim_reduction: int = 4
    keep_ratio: float = 0.8
    res_ratio: float = 0.5

    def setup(self):
        assert self.method in ("default", "FC", "Adapter", "TaskRes")
        dim = np.asarray(self.prompt_features).shape[-1]
        if self.method == "Adapter":
            self.adapter = Adapter(dim, self.dim_reduction)
        elif self.method == "TaskRes":
            self.residual_features = self.param(
                "residual_features", nn.initializers.normal(1.0), (self.num_prompts, dim))
            if self.neg_prompt_features is not None:
                self.neg_residual_features = self.param(
                    "neg_residual_features", nn.initializers.normal(1.0), (1, dim))
        elif self.method == "FC":
            self.fc = TorchLinear(dim, use_bias=False, name="fc")
            self.fc_dropout = nn.Dropout(0.25)

    def get_raw_prompt_features(self) -> Array:
        raw = jnp.asarray(self.prompt_features)
        if self.neg_prompt_features is not None:
            raw = jnp.concatenate([raw, jnp.asarray(self.neg_prompt_features)], axis=0)
        return raw

    def __call__(self, train: bool = False) -> Array:
        pf = jnp.asarray(self.prompt_features)
        if self.method == "Adapter":
            adapted = self.adapter(pf)
            return (1 - self.keep_ratio) * adapted + self.keep_ratio * pf
        if self.method == "TaskRes":
            text = self.res_ratio * self.residual_features + pf
            if self.neg_prompt_features is not None:
                neg = jnp.asarray(self.neg_prompt_features)
                neg = self.res_ratio * self.neg_residual_features + neg
                text = jnp.concatenate([text, neg], axis=0)
            return text
        if self.method == "FC":
            x = pf
            if self.neg_prompt_features is not None:
                x = jnp.concatenate([x, jnp.asarray(self.neg_prompt_features)], axis=0)
            # reference applies Dropout(0.25) inside fc; only active in train
            out = self.fc(x)
            out = self.fc_dropout(out, deterministic=not train)
            return out
        return pf
