"""CoCa multimodal caption decoder + generation.

Completes the SURVEY.md §2.2 "vendored CONCH (CoCa)" row: the caption path
(`CoCa.generate`, ref model/conch/coca_model.py:247-346) on top of the
`MultimodalTransformer` decoder (ref model/conch/transformer.py:452-576) —
causal self-attention blocks interleaved with image cross-attention blocks,
final LN + projection to the vocabulary.

TPU-first decode: a fixed-length token buffer is re-fed through ONE compiled
program per step (causal masking makes positions > t inert for the logits at
t), so the whole loop runs with a single XLA executable — no per-length
recompiles, static shapes throughout.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .text_encoder import ResidualAttentionBlock, causal_mask

Array = jax.Array


class TorchCrossAttention(nn.Module):
    """torch nn.MultiheadAttention(d, h) used cross-modally: the fused
    in_proj rows split into q (text) / k,v (image) projections."""
    width: int
    heads: int

    @nn.compact
    def __call__(self, q_x: Array, kv_x: Array) -> Array:
        D, H = self.width, self.heads
        hd = D // H
        B, L, _ = q_x.shape
        S = kv_x.shape[1]
        in_w = self.param("in_proj_weight", nn.initializers.normal(D ** -0.5),
                          (3 * D, D))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        out_w = self.param("out_proj_weight", nn.initializers.normal(D ** -0.5),
                           (D, D))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (D,))
        q = q_x @ in_w[:D].T + in_b[:D]
        k = kv_x @ in_w[D:2 * D].T + in_b[D:2 * D]
        v = kv_x @ in_w[2 * D:].T + in_b[2 * D:]
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        return ctx @ out_w.T + out_b


class CrossResidualAttentionBlock(nn.Module):
    """ResidualAttentionBlock with is_cross_attention=True
    (ref model/conch/transformer.py:191-246: ln_1 on queries, ln_1_kv on
    keys/values, GELU MLP)."""
    width: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array, kv: Array) -> Array:
        D = self.width
        q = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        k = nn.LayerNorm(epsilon=1e-5, name="ln_1_kv")(kv)
        x = x + TorchCrossAttention(D, self.heads, name="attn")(q, k)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        mlp_w = int(D * self.mlp_ratio)
        c_fc_w = self.param("c_fc_weight", nn.initializers.normal((2 * D) ** -0.5),
                            (mlp_w, D))
        c_fc_b = self.param("c_fc_bias", nn.initializers.zeros, (mlp_w,))
        c_proj_w = self.param("c_proj_weight", nn.initializers.normal(D ** -0.5),
                              (D, mlp_w))
        c_proj_b = self.param("c_proj_bias", nn.initializers.zeros, (D,))
        hid = jax.nn.gelu(h @ c_fc_w.T + c_fc_b, approximate=False)
        return x + (hid @ c_proj_w.T + c_proj_b)


class MultimodalDecoder(nn.Module):
    """ref model/conch/transformer.py:452-576 MultimodalTransformer:
    per layer, a causal self-attn block over the text embeddings followed by
    a cross-attn block over the image tokens; ln_final + vocab projection."""
    width: int = 768
    heads: int = 12
    layers: int = 12
    context_length: int = 128
    output_dim: int = 32007  # vocab size (caption logits)

    @nn.compact
    def __call__(self, image_embs: Array, text_embs: Array) -> Array:
        """image_embs [B, S, W] (caption-pooled tokens), text_embs [B, L, W]
        -> logits [B, L, vocab]."""
        L = text_embs.shape[1]
        mask = causal_mask(self.context_length)[:L, :L]
        x = text_embs
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, quick_gelu=False,
                name=f"resblock_{i}")(x, mask)
            x = CrossResidualAttentionBlock(
                self.width, self.heads, name=f"cross_{i}")(x, image_embs)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection",
                          nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return x @ proj


def import_multimodal_state(state: dict, layers: int,
                            prefix: str = "text_decoder.") -> dict:
    """torch MultimodalTransformer state dict -> MultimodalDecoder params."""
    g = lambda k: np.asarray(state[prefix + k])
    params = {
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(layers):
        rb = f"resblocks.{i}."
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": g(rb + "ln_1.weight"), "bias": g(rb + "ln_1.bias")},
            "ln_2": {"scale": g(rb + "ln_2.weight"), "bias": g(rb + "ln_2.bias")},
            "attn": {
                "in_proj_weight": g(rb + "attn.in_proj_weight"),
                "in_proj_bias": g(rb + "attn.in_proj_bias"),
                "out_proj_weight": g(rb + "attn.out_proj.weight"),
                "out_proj_bias": g(rb + "attn.out_proj.bias"),
            },
            "c_fc_weight": g(rb + "mlp.c_fc.weight"),
            "c_fc_bias": g(rb + "mlp.c_fc.bias"),
            "c_proj_weight": g(rb + "mlp.c_proj.weight"),
            "c_proj_bias": g(rb + "mlp.c_proj.bias"),
        }
        cb = f"cross_attn.{i}."
        params[f"cross_{i}"] = {
            "ln_1": {"scale": g(cb + "ln_1.weight"), "bias": g(cb + "ln_1.bias")},
            "ln_1_kv": {"scale": g(cb + "ln_1_kv.weight"),
                        "bias": g(cb + "ln_1_kv.bias")},
            "ln_2": {"scale": g(cb + "ln_2.weight"), "bias": g(cb + "ln_2.bias")},
            "attn": {
                "in_proj_weight": g(cb + "attn.in_proj_weight"),
                "in_proj_bias": g(cb + "attn.in_proj_bias"),
                "out_proj_weight": g(cb + "attn.out_proj.weight"),
                "out_proj_bias": g(cb + "attn.out_proj.bias"),
            },
            "c_fc_weight": g(cb + "mlp.c_fc.weight"),
            "c_fc_bias": g(cb + "mlp.c_fc.bias"),
            "c_proj_weight": g(cb + "mlp.c_proj.weight"),
            "c_proj_bias": g(cb + "mlp.c_proj.bias"),
        }
    return params


def coca_generate(text_tower, text_params, decoder, decoder_params,
                  image_embs: Array, seq_len: int = 30,
                  sot_token_id: int = 1, eos_token_id: int = 2,
                  pad_token_id: int = 0,
                  generation_type: str = "beam_search",
                  top_k: int = 1, top_p: float = 0.1,
                  temperature: float = 1.0, min_seq_len: int = 5,
                  repetition_penalty: float = 1.0,
                  num_beams: int = 6, num_beam_groups: int = 3,
                  diversity_penalty: float = 0.0,
                  seed: int = 0) -> np.ndarray:
    """Caption generation (ref model/conch/coca_model.py:247-346).

    `image_embs` [B, S, W] are the caption-pooled image tokens (from
    `ConchVisualModel`).  `generation_type` matches the reference surface:

      * "top_k"  — greedy when top_k=1, else top-k sampling,
      * "top_p"  — nucleus sampling (HF TopPLogitsWarper semantics),
      * "beam_search" — the reference's DEFAULT (ref coca_model.py:254),
        which in the vendored reference raises ValueError (its
        GENERATION_TYPES maps only top_k/top_p, ref coca_model.py:27-37);
        here it runs the grouped beam search the vendoring dropped
        (vlsa_tpu/models/generation.py).

    MinLength / RepetitionPenalty processing and the warpers are numpy
    ports of the HF processors the reference wires in (ref
    coca_model.py:275-296), parity-tested in tests/test_generation.py.
    EOS is forced at seq_len in the sampling paths like the reference;
    finished rows emit pads.  One compiled fixed-shape step is reused for
    every position (causal masking makes positions past the current one
    inert for earlier logits) — no per-length recompiles.
    """
    from .generation import (beam_search, min_length_process,
                             repetition_penalty_process, top_k_warp,
                             top_p_warp)

    B = image_embs.shape[0]

    def make_step_logits(embs):
        @jax.jit
        def step_logits(buf):
            # feed the full fixed-length buffer: causal masking makes
            # positions past the current one inert for earlier logits
            _pooled, tokens = text_tower.apply(
                {"params": text_params}, prompts_text=None,
                prompts_embedding=text_tower.apply(
                    {"params": text_params}, method=text_tower.embed_tokens,
                    token_ids=buf),
                prompts_pseudo_tokens=buf, return_tokens=True)
            return decoder.apply({"params": decoder_params}, embs, tokens)
        return step_logits

    if generation_type == "beam_search":
        R = B * num_beams
        step_logits = make_step_logits(jnp.repeat(image_embs, num_beams,
                                                  axis=0))

        def step_fn(ids: np.ndarray) -> np.ndarray:
            t = ids.shape[1]
            buf = np.full((R, seq_len), pad_token_id, np.int64)
            buf[:, :t] = ids
            return np.array(step_logits(jnp.asarray(buf)))[:, t - 1]

        return beam_search(
            step_fn, B, seq_len, sot_token_id=sot_token_id,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id,
            num_beams=num_beams, num_beam_groups=num_beam_groups,
            min_seq_len=min_seq_len, repetition_penalty=repetition_penalty,
            diversity_penalty=diversity_penalty)

    if generation_type not in ("top_k", "top_p"):
        # same contract as the reference (ref coca_model.py:293-296) for
        # unknown types — but note beam_search WORKS here
        raise ValueError(
            "generation_type has to be one of "
            "| beam_search | top_k | top_p |.")

    step_logits = make_step_logits(image_embs)
    rng = np.random.default_rng(seed)
    buf = np.full((B, seq_len), pad_token_id, np.int64)
    buf[:, 0] = sot_token_id
    finished = np.zeros(B, bool)
    for t in range(1, seq_len):
        logits = np.array(step_logits(jnp.asarray(buf)))[:, t - 1]  # [B, V]
        # processor order matches the reference: MinLength, then
        # RepetitionPenalty, then the warper, then temperature
        logits = min_length_process(logits, t, min_seq_len, eos_token_id)
        logits = repetition_penalty_process(logits, buf[:, :t],
                                            repetition_penalty)
        if generation_type == "top_p":
            logits = top_p_warp(logits, top_p)
        else:
            logits = top_k_warp(logits, top_k)
        if t == seq_len - 1:
            nxt = np.full(B, eos_token_id)
        elif generation_type == "top_k" and top_k <= 1:
            nxt = np.argmax(logits, axis=-1)
        else:
            filt = logits / temperature
            p = np.exp(filt - filt.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            nxt = np.array([rng.choice(len(pi), p=pi) for pi in p])
        nxt = np.where(finished, pad_token_id, nxt)
        buf[:, t] = nxt
        finished |= (nxt == eos_token_id)
        if finished.all():
            break
    return buf
