"""Host-side construction of prompt-learner constants.

Replicates the init-time logic of ref model/prompt_learners/
plain_prompt_learner.py:135-279 (template build, pseudo tokens, context/rank
embedding init from the tokenizer + embedding table) and the PromptAdapter
text-feature precompute (ref prompt_adapter.py:45-82), producing plain numpy
constants consumed by the Flax modules in `prompt_learners.py`.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from ..data.io import load_init_prompt, load_init_text
from .prompt_learners import (
    PlainPromptLearner,
    PromptAdapter,
    RankPromptLearner,
    create_interpolation_weights,
)
from .tokenizer import Tokenizer


def _embed(embedding_table: np.ndarray, token_ids) -> np.ndarray:
    return embedding_table[np.asarray(token_ids)]


def create_context_embeds(tokenizer: Tokenizer, embedding_table, num_ranks,
                          num_context_tokens, init_context,
                          rank_specific_context, embedding_dim):
    """ref plain_prompt_learner.py:233-279."""
    if init_context is not None:
        init_context = init_context.replace("_", " ")
        prompt_tokens, n_ctx = tokenizer(init_context, return_raw_tokens=True,
                                         return_num_tokens=True)
        context_embeds = _embed(embedding_table, prompt_tokens)
        num_context_tokens = int(n_ctx)
        if rank_specific_context:
            context_embeds = np.repeat(context_embeds[None], num_ranks, axis=0)
    else:
        rng = np.random.default_rng(0)
        shape = ((num_ranks, num_context_tokens, embedding_dim)
                 if rank_specific_context else (num_context_tokens, embedding_dim))
        context_embeds = rng.normal(0, 0.02, size=shape).astype(np.float32)
    return context_embeds, num_context_tokens


def create_rank_embeds(tokenizer: Tokenizer, embedding_table, num_ranks,
                       num_tokens_per_rank, init_rank_names, num_context_tokens,
                       max_num_tokens, embedding_dim):
    """ref plain_prompt_learner.py:176-231 (name selection/extension +
    embedding)."""
    if init_rank_names is not None:
        num_can = len(init_rank_names)
        if num_can > num_ranks:
            sel = np.linspace(0, num_can - 1, num_ranks).astype(np.int32)
            rank_names = [init_rank_names[i] for i in sel]
        elif num_can < num_ranks:
            len_sec = num_ranks // num_can
            rank_names = [init_rank_names[min(i // len_sec, num_can - 1)]
                          for i in range(num_ranks)]
        else:
            rank_names = list(init_rank_names)
        rank_tokens, counts = tokenizer(rank_names, return_raw_tokens=True,
                                        return_num_tokens=True)
        num_tokens_per_rank = [int(c) for c in counts]
        max_ntr = max(num_tokens_per_rank)
        if max_ntr > max_num_tokens - num_context_tokens - 3:
            raise ValueError(f"The rank name is too long: "
                             f"{rank_names[int(np.argmax(num_tokens_per_rank))]}.")
        rank_embeds = _embed(embedding_table, rank_tokens)
    else:
        if isinstance(num_tokens_per_rank, int):
            num_tokens_per_rank = [num_tokens_per_rank] * num_ranks
        max_ntr = max(num_tokens_per_rank)
        if max_num_tokens < num_context_tokens + max_ntr + 3:
            raise ValueError(f"num_tokens_per_rank too large: {max_ntr}")
        rng = np.random.default_rng(1)
        rank_embeds = rng.normal(0, 0.02, size=(num_ranks, max_ntr, embedding_dim)
                                 ).astype(np.float32)
    return rank_embeds, num_tokens_per_rank


def create_pseudo_sentence_tokens(num_tokens_per_rank, num_context_tokens,
                                  num_ranks, max_num_tokens) -> np.ndarray:
    """<sot> <ctx...> <rank_i...> <.> <eot> positions (ref lines 160-174)."""
    pseudo = np.zeros((num_ranks, max_num_tokens), dtype=np.int64)
    for i in range(num_ranks):
        ntr = num_tokens_per_rank[i] if isinstance(num_tokens_per_rank, (list, tuple)) \
            else num_tokens_per_rank
        sentence_length = 1 + num_context_tokens + ntr + 1 + 1
        pseudo[i, :sentence_length] = np.arange(sentence_length) + 1
    return pseudo


def create_sentence_embeds_template(tokenizer: Tokenizer, embedding_table,
                                    num_ranks, pseudo_sentence_tokens,
                                    max_num_tokens) -> np.ndarray:
    """Pad-filled template with sot/eot/full-stop markers (ref lines 135-158)."""
    token_ids, num_tokens = tokenizer("X.", return_raw_tokens=False,
                                      return_num_tokens=True)
    assert num_tokens == 2, "Expected 2 text tokens for the text `X.`."
    assert token_ids[0] == tokenizer.bos_token_id
    assert token_ids[3] == tokenizer.eos_token_id
    pad_embed = _embed(embedding_table, [tokenizer.pad_token_id])[0]
    sot_embed = _embed(embedding_table, [token_ids[0]])[0]
    eot_embed = _embed(embedding_table, [token_ids[3]])[0]
    full_stop_embed = _embed(embedding_table, [token_ids[2]])[0]

    sentence = np.repeat(pad_embed[None, None], num_ranks, axis=0)
    sentence = np.repeat(sentence, max_num_tokens, axis=1).astype(np.float32)
    argmax_index = pseudo_sentence_tokens.argmax(axis=-1)
    for i in range(num_ranks):
        sentence[i, 0] = sot_embed
        sentence[i, argmax_index[i]] = eot_embed
        sentence[i, argmax_index[i] - 1] = full_stop_embed
    return sentence


def build_prompt_learner(method: str, cfg: dict, tokenizer: Tokenizer,
                         embedding_table: np.ndarray, max_num_tokens: int,
                         embedding_dim: int):
    """Construct a Plain/Rank prompt learner module with host-built constants
    (registry semantics of ref model/prompt_learners/__init__.py:6-17)."""
    num_ranks = cfg["num_ranks"]
    init_context, init_rank_names = load_init_prompt(
        cfg.get("init_prompt_path"), cfg.get("init_prompt_context_idx", 0),
        cfg.get("init_prompt_rank_idx", 0))
    rank_specific = bool(cfg.get("rank_specific_context", False))

    ctx_embeds, num_context_tokens = create_context_embeds(
        tokenizer, embedding_table, num_ranks, cfg.get("num_context_tokens", 8),
        init_context, rank_specific, embedding_dim)

    if method == "plain":
        rank_embeds, ntr = create_rank_embeds(
            tokenizer, embedding_table, num_ranks, cfg.get("num_tokens_per_rank", 4),
            init_rank_names, num_context_tokens, max_num_tokens, embedding_dim)
        pseudo = create_pseudo_sentence_tokens(ntr, num_context_tokens, num_ranks,
                                               max_num_tokens)
        template = create_sentence_embeds_template(
            tokenizer, embedding_table, num_ranks, pseudo, max_num_tokens)
        return PlainPromptLearner(
            num_ranks=num_ranks,
            num_context_tokens=num_context_tokens,
            num_tokens_per_rank=tuple(ntr),
            rank_tokens_position=cfg.get("rank_tokens_position", "tail"),
            rank_specific_context=rank_specific,
            embedding_dim=embedding_dim,
            sentence_template=template,
            pseudo_sentence_tokens=pseudo,
            context_init=ctx_embeds,
            rank_init=rank_embeds,
        )

    if method == "rank":
        num_base_ranks = cfg.get("num_base_ranks", 4)
        rank_embeds, base_ntr = create_rank_embeds(
            tokenizer, embedding_table, num_base_ranks, cfg.get("num_tokens_per_rank", 4),
            init_rank_names, num_context_tokens, max_num_tokens, embedding_dim)
        # all final ranks use the max base token count (ref rank_prompt_learner.py:61-68)
        ntr = [max(base_ntr)] * num_ranks
        pseudo = create_pseudo_sentence_tokens(ntr, num_context_tokens, num_ranks,
                                               max_num_tokens)
        template = create_sentence_embeds_template(
            tokenizer, embedding_table, num_ranks, pseudo, max_num_tokens)
        interp = create_interpolation_weights(
            num_base_ranks, num_ranks, cfg.get("interpolation_type", "linear"))
        return RankPromptLearner(
            num_ranks=num_ranks,
            num_base_ranks=num_base_ranks,
            num_context_tokens=num_context_tokens,
            num_tokens_per_rank=tuple(ntr),
            rank_tokens_position=cfg.get("rank_tokens_position", "tail"),
            rank_specific_context=rank_specific,
            embedding_dim=embedding_dim,
            sentence_template=template,
            pseudo_sentence_tokens=pseudo,
            context_init=ctx_embeds,
            rank_init=rank_embeds,
            interpolation_weights=interp,
        )

    raise ValueError(f"unknown prompt learner method {method}")


def build_prompt_adapter(cfg: dict, tokenizer: Tokenizer, encode_texts_fn) -> PromptAdapter:
    """Construct a PromptAdapter whose frozen prompt features are precomputed
    through the (frozen) text tower via `encode_texts_fn(token_ids) -> [P, D]`
    (ref prompt_adapter.py:45-82 + registry __init__.py:19-22)."""
    num_prompts = cfg["num_prompts"]
    pretrained = cfg.get("pretrained_prompt_features")
    if pretrained is not None:
        prompt_features = np.asarray(pretrained)
        assert len(prompt_features) == num_prompts
    else:
        if cfg.get("init_prompt_path"):
            _, init_texts = load_init_prompt(
                cfg["init_prompt_path"], cfg.get("init_prompt_context_idx", 0),
                cfg.get("init_prompt_rank_idx", 0), replace=True)
        elif cfg.get("load_path"):
            init_texts = load_init_text(cfg["load_path"], key=str(cfg.get("load_idx", 0)))
        else:
            raise RuntimeError("Specify `init_prompt_path` or `load_path`.")
        assert len(init_texts) == num_prompts, \
            f"Expected {num_prompts} initial prompts, but got {len(init_texts)}."
        token_ids = tokenizer(init_texts, return_raw_tokens=False, return_num_tokens=False)
        prompt_features = np.asarray(encode_texts_fn(token_ids))

    neg_features = None
    if cfg.get("load_negative_prompts"):
        assert cfg.get("load_path") is not None, "Found null `load_path`."
        neg_texts = load_init_text(cfg["load_path"],
                                   key=cfg.get("load_negative_idx", "prompt_normal_tissue"))
        neg_ids = tokenizer(neg_texts, return_raw_tokens=False, return_num_tokens=False)
        neg_features = np.asarray(encode_texts_fn(neg_ids)).mean(0, keepdims=True)

    return PromptAdapter(
        method=cfg.get("method", "default"),
        num_prompts=num_prompts,
        prompt_features=prompt_features,
        neg_prompt_features=neg_features,
        dim_reduction=cfg.get("dim_reduction", 4),
        keep_ratio=cfg.get("keep_ratio", 0.8),
        res_ratio=cfg.get("res_ratio", 0.5),
    )
