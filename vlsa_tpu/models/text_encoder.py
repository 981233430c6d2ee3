"""Text towers (CLIP / HF-CLIP / CONCH) in Flax, driven by prompt embeddings.

Behavioural ports of ref model/prompt_encoder.py (which itself re-implements
the official towers so they accept *prompt embeddings* instead of token ids):

  * CLIP  (ref prompt_encoder.py:35-96):  causal mask, ln_final on all tokens,
    eot-argmax pooling, projection matrix.
  * HF    (ref prompt_encoder.py:99-207): causal + pad key mask.
  * CONCH (ref prompt_encoder.py:210-322): 127 tokens + appended <cls> token,
    causal+cls additive mask, ln_final on the pooled cls only, 768->512
    projection (model config: ref model/conch/model_configs/conch_ViT-B-16.json).

Parameters are stored in the torch layout (in_proj_weight [3D, D], weights as
[out, in]) so reference checkpoints import 1:1; compute lowers to plain XLA
matmuls that fuse onto the MXU.  GELU is exact (erf), matching torch nn.GELU.
"""
from __future__ import annotations

from typing import Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = float("-inf")


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class TorchMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention semantics with additive attention mask.

    mask: [L, L] or [K, 1, L, L] additive (-inf excluded).
    `compute_dtype` runs the matmuls in bf16 on the MXU (f32 accumulation);
    softmax stays f32."""
    width: int
    heads: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None) -> Array:
        D, H = self.width, self.heads
        hd = D // H
        cdt = jnp.dtype(self.compute_dtype)
        attn_std = D ** -0.5
        proj_std = (D ** -0.5) * ((2 * 12) ** -0.5)
        in_w = self.param("in_proj_weight", nn.initializers.normal(attn_std), (3 * D, D))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        out_w = self.param("out_proj_weight", nn.initializers.normal(proj_std), (D, D))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (D,))

        K_, L, _ = x.shape
        qkv = jnp.dot(x.astype(cdt), in_w.T.astype(cdt),
                      preferred_element_type=jnp.float32) + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(K_, L, H, hd).transpose(0, 2, 1, 3)  # [K, H, L, hd]

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt), k.astype(cdt),
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                logits = logits + attn_mask[None, None]
            else:
                logits = logits + attn_mask  # [K, 1, L, L] broadcast over heads
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(cdt), v.astype(cdt),
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(K_, L, D)
        return jnp.dot(ctx.astype(cdt), out_w.T.astype(cdt),
                       preferred_element_type=jnp.float32) + out_b


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (ref model/conch/transformer.py:191-246)."""
    width: int
    heads: int
    mlp_ratio: float = 4.0
    quick_gelu: bool = False  # OpenAI CLIP uses x*sigmoid(1.702x)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None) -> Array:
        D = self.width
        mlp_width = int(D * self.mlp_ratio)
        fc_std = (2 * D) ** -0.5
        proj_std = (D ** -0.5) * ((2 * 12) ** -0.5)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + TorchMultiheadAttention(D, self.heads,
                                        compute_dtype=self.compute_dtype,
                                        name="attn")(h, attn_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        c_fc_w = self.param("c_fc_weight", nn.initializers.normal(fc_std), (mlp_width, D))
        c_fc_b = self.param("c_fc_bias", nn.initializers.zeros, (mlp_width,))
        c_proj_w = self.param("c_proj_weight", nn.initializers.normal(proj_std), (D, mlp_width))
        c_proj_b = self.param("c_proj_bias", nn.initializers.zeros, (D,))
        act = _quick_gelu if self.quick_gelu else _gelu
        cdt = jnp.dtype(self.compute_dtype)
        hid = act(jnp.dot(h.astype(cdt), c_fc_w.T.astype(cdt),
                          preferred_element_type=jnp.float32) + c_fc_b)
        x = x + (jnp.dot(hid.astype(cdt), c_proj_w.T.astype(cdt),
                         preferred_element_type=jnp.float32) + c_proj_b)
        return x


class _ScanResidualBlock(ResidualAttentionBlock):
    """nn.scan carrier: same math, (carry, None) return convention."""

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None):
        return ResidualAttentionBlock.__call__(self, x, attn_mask), None


def stack_resblock_params(tower_params: Mapping) -> dict:
    """Convert per-layer `resblock_i` param subtrees to the stacked
    `blocks` layout (leading layer axis) that `scan_layers=True` uses.
    Non-resblock entries pass through."""
    out = {k: v for k, v in tower_params.items()
           if not k.startswith("resblock_")}
    layer_keys = sorted((k for k in tower_params if k.startswith("resblock_")),
                        key=lambda k: int(k.split("_")[-1]))
    if layer_keys:
        import numpy as _np
        out["blocks"] = jax.tree.map(
            lambda *leaves: _np.stack([_np.asarray(l) for l in leaves]),
            *[tower_params[k] for k in layer_keys])
    return out


def causal_mask(L: int, dtype=jnp.float32) -> Array:
    m = jnp.full((L, L), NEG_INF, dtype)
    return jnp.triu(m, 1)


class TextTower(nn.Module):
    """Unified text tower; `api` selects masking/pooling behaviour."""
    width: int = 768
    heads: int = 12
    layers: int = 12
    context_length: int = 128
    vocab_size: int = 32007
    output_dim: int = 512
    api: str = "CONCH"  # CONCH | CLIP | HF
    pad_id: int = 0
    dtype: str = "float32"
    remat: bool = False  # rematerialise blocks (trade FLOPs for memory)
    # lax.scan over stacked per-layer params: one compiled block body
    # instead of `layers` unrolled copies.  Collapses the tower's XLA
    # op count ~layers-fold (the [K, L, D] tensors are small, so the
    # unrolled tower is op-overhead-bound, not FLOP-bound — docs/PERF.md);
    # params live under a single `blocks` subtree with a leading layer
    # axis (stack_resblock_params converts the per-layer layout)
    scan_layers: bool = False

    @property
    def max_num_tokens(self) -> int:
        # CONCH reserves the last slot for <cls> (ref prompt_encoder.py:239-243)
        return self.context_length - 1 if self.api == "CONCH" else self.context_length

    def setup(self):
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width))
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        if self.api == "CONCH":
            self.cls_emb = self.param("cls_emb", nn.initializers.normal(0.01), (self.width,))
        quick = self.api in ("CLIP", "HF")  # OpenAI/HF CLIP towers use QuickGELU
        if self.scan_layers:
            scan_cls = (nn.remat(_ScanResidualBlock, static_argnums=())
                        if self.remat else _ScanResidualBlock)
            self.blocks_scan = nn.scan(
                scan_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.layers,
                in_axes=nn.broadcast,
            )(self.width, self.heads, quick_gelu=quick,
              compute_dtype=self.dtype, name="blocks")
            self.blocks = []
        else:
            block_cls = (nn.remat(ResidualAttentionBlock, static_argnums=())
                         if self.remat else ResidualAttentionBlock)
            self.blocks = [
                block_cls(self.width, self.heads, quick_gelu=quick,
                          compute_dtype=self.dtype,
                          name=f"resblock_{i}")
                for i in range(self.layers)
            ]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim))

    def embed_tokens(self, token_ids: Array) -> Array:
        return jnp.take(self.token_embedding, token_ids, axis=0)

    def _conch_cls_mask(self, pseudo_tokens: Array, L: int) -> Array:
        """Additive mask where only the appended <cls> row excludes pad keys
        (ref prompt_encoder.py:245-252).

        Note the faithful off-by-one: open_clip's build_cls_mask F.pad
        prepends a force-valid column, so key j is valid iff token j-1 is a
        real token — the <cls> slot itself inherits the last pad's validity.
        """
        K = pseudo_tokens.shape[0]
        valid = pseudo_tokens != self.pad_id          # [K, L-1]
        cls_row = jnp.concatenate(
            [jnp.ones((K, 1), bool), valid], axis=1)  # right-shifted key validity
        mask = jnp.zeros((K, L, L))
        mask = mask.at[:, L - 1, :].set(jnp.where(cls_row, 0.0, NEG_INF))
        return mask[:, None]                           # [K, 1, L, L]

    def __call__(self, prompts_embedding: Optional[Array] = None,
                 prompts_pseudo_tokens: Optional[Array] = None,
                 prompts_text: Optional[Array] = None,
                 return_tokens: bool = False) -> Array:
        if prompts_text is not None:
            if self.api == "CONCH":
                assert prompts_text.shape[1] == self.max_num_tokens + 1
                prompts_text = prompts_text[:, :-1]  # make room for <cls>
            if prompts_pseudo_tokens is None:
                prompts_pseudo_tokens = generate_pseudo_tokens(
                    np.asarray(prompts_text), self.api, self.pad_id)
            x = self.embed_tokens(prompts_text)
        else:
            assert prompts_embedding is not None and prompts_pseudo_tokens is not None
            x = prompts_embedding
        K, seq_len, _ = x.shape
        # shorter-than-context inputs are allowed for every api: with causal
        # attention, positions past the last real token cannot influence the
        # eot/cls readout, so trimmed prompts give identical poolings while
        # skipping dead attention/MLP work on padding (TPU-first trimming;
        # the reference always runs full-context, prompt_encoder.py:210-322)
        assert seq_len <= self.max_num_tokens

        attn_mask = causal_mask(self.context_length)
        if self.api == "CONCH":
            # the appended cls token keeps the positional row it has at full
            # context length (index context_length-1), so the trimmed forward
            # is numerically identical to the full one
            x = x + self.positional_embedding[:seq_len]
            cls_vec = self.cls_emb + self.positional_embedding[self.context_length - 1]
            seq_len += 1
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cls_vec[None, None], (K, 1, self.width))], axis=1)
            cls_mask = self._conch_cls_mask(prompts_pseudo_tokens, seq_len)
            attn_mask = attn_mask[None, None, :seq_len, :seq_len] + cls_mask
        elif self.api == "HF":
            key_valid = prompts_pseudo_tokens > 0  # [K, L]
            pad_mask = jnp.where(key_valid[:, None, :], 0.0, NEG_INF)  # [K, 1, L]
            attn_mask = attn_mask[None, None, :seq_len, :seq_len] + pad_mask[:, None]
            x = x + self.positional_embedding[:seq_len]
        else:  # CLIP: causal only
            attn_mask = attn_mask[:seq_len, :seq_len]
            x = x + self.positional_embedding[:seq_len]
        if self.scan_layers:
            x, _ = self.blocks_scan(x, attn_mask)
        else:
            for blk in self.blocks:
                x = blk(x, attn_mask)

        if self.api == "CONCH":
            # per-token outputs (caption-decoder input) are PRE-ln_final in
            # the cls branch (ref model/conch/transformer.py:440-442)
            tokens = x[:, :-1]
            pooled = self.ln_final(x[:, -1])
        else:
            x = self.ln_final(x)
            tokens = x
            eot_idx = jnp.argmax(prompts_pseudo_tokens, axis=-1)
            pooled = x[jnp.arange(K), eot_idx]
        pooled = pooled @ self.text_projection
        if return_tokens:
            return pooled, tokens
        return pooled


def generate_pseudo_tokens(token_ids: np.ndarray, api: str, pad_id: int = 0,
                           eos_token_id: Optional[int] = None) -> np.ndarray:
    """Pseudo tokens: 1..sentence_len at real-token positions, 0 at pads
    (ref prompt_encoder.py generate_pseudo_tokens of each class)."""
    token_ids = np.asarray(token_ids)
    if api == "CLIP":
        idx_eot = token_ids.argmax(axis=-1)
    elif api == "CONCH":
        idx_eot = (token_ids == pad_id).astype(np.int32).argmax(axis=-1) - 1
    elif api == "HF":
        assert eos_token_id is not None
        idx_eot = (token_ids == eos_token_id).astype(np.int32).argmax(axis=-1)
    else:
        raise ValueError(api)
    pseudo = np.zeros_like(token_ids)
    for i in range(token_ids.shape[0]):
        sl = int(idx_eot[i]) + 1
        pseudo[i, :sl] = np.arange(sl) + 1
    return pseudo


def make_text_tower(api: str, name: str = "prompt_encoder", **overrides) -> TextTower:
    """Factory with the published tower configs."""
    if api == "CONCH":
        cfg = dict(width=768, heads=12, layers=12, context_length=128,
                   vocab_size=32007, output_dim=512)
    elif api == "CLIP":
        cfg = dict(width=512, heads=8, layers=12, context_length=77,
                   vocab_size=49408, output_dim=512)
    elif api == "HF":
        cfg = dict(width=512, heads=8, layers=12, context_length=77,
                   vocab_size=49408, output_dim=512)
    else:
        raise ValueError(api)
    cfg.update(overrides)
    return TextTower(api=api, name=name, **cfg)
