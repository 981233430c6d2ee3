"""Parameter-precision utilities.

`cast_frozen_tower_weights` stores a frozen text tower's 2-D matmul weights
in the tower's compute dtype (bf16).  The tower already casts these with
`.astype(compute_dtype)` inside every matmul (text_encoder.py), so when the
weights are frozen the per-step cast is loop-invariant work: pre-casting
once is numerically IDENTICAL (same rounding, applied once) and

  * removes the cast reads/writes from every training step, and
  * halves the tower's weight HBM traffic (bf16 instead of f32 reads).

Only the 2-D `*_weight` matrices are cast — biases are added to the f32
matmul results, LayerNorm params stay f32 (LN runs f32), and the token /
positional embeddings stay f32 because they are spliced with the learnable
f32 prompt vectors before the per-block input cast.
"""
from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def cast_frozen_tower_weights(params: Mapping, module: str = "prompt_encoder",
                              dtype=jnp.bfloat16) -> dict:
    """Return params with `module`'s resblock 2-D matmul weights cast to
    `dtype`.  Embeddings (`token_embedding`, `positional_embedding`,
    `cls_emb`), LayerNorm params and biases keep f32.  No-op if the module
    is absent."""
    params = dict(params)
    if module not in params:
        return params
    tower = dict(params[module])
    for k, v in tower.items():
        if k.startswith("resblock"):
            tower[k] = jax.tree.map(
                lambda t: t.astype(dtype)
                if t.ndim == 2 and t.dtype == jnp.float32 else t,
                dict(v))
        elif k == "blocks":
            # scan_layers layout: stacked [L, out, in] matmul weights
            tower[k] = jax.tree_util.tree_map_with_path(
                lambda path, t: t.astype(dtype)
                if (t.ndim == 3 and t.dtype == jnp.float32
                    and str(getattr(path[-1], "key", "")).endswith("weight"))
                else t,
                dict(v))
    params[module] = tower
    return params


def cast_vision_tower_weights(params: Mapping, dtype=jnp.bfloat16) -> dict:
    """Pre-cast a frozen VISION tower's matmul/conv weights to `dtype`.

    Covers exactly the tensors the modules already cast in-graph (so the
    result is bit-identical, the rounding just happens once at load):

      * ConchVisualModel: `trunk.patch_embed_weight` (4-D conv, computed in
        compute_dtype) and each `trunk.block_i`'s 2-D `*_weight`
        (qkv/proj/fc1/fc2).  The attentional poolers compute f32 and keep
        f32 weights; LN params / embeddings / biases stay f32.
      * CLIPViT: each `resblock_i`'s 2-D f32 `*_weight` (same rule as the
        text tower, whose ResidualAttentionBlock the ViT reuses).  The
        stem conv runs f32 and keeps f32 weights.
    """
    def cast_block(block: Mapping) -> dict:
        return jax.tree.map(
            lambda t: t.astype(dtype)
            if t.ndim == 2 and t.dtype == jnp.float32 else t, dict(block))

    params = dict(params)
    if "trunk" in params:  # ConchVisualModel
        trunk = dict(params["trunk"])
        for k, v in trunk.items():
            if k.startswith("block_"):
                trunk[k] = cast_block(v)
            elif k == "patch_embed_weight" and v.dtype == jnp.float32:
                trunk[k] = v.astype(dtype)
        params["trunk"] = trunk
    for k, v in params.items():  # CLIPViT
        if k.startswith("resblock_"):
            params[k] = cast_block(v)
    return params

# ---------------------------------------------------------------------------
# int8 weight quantization for the frozen extraction trunk (w8a8 opt-in)
# ---------------------------------------------------------------------------

_TRUNK_LINEARS = ("qkv_weight", "proj_weight", "fc1_weight", "fc2_weight")


def quantize_rows(w):
    """Symmetric per-output-channel int8 quantization of a [out, in] matmul
    weight.  Returns (q int8 [out, in], scale f32 [out]) with w ~= q * scale.

    127 (not 128) keeps the grid symmetric, so dequantization is a single
    multiply; ties round to even like `jnp.round`."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=1)
    s = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.round(w / s[:, None]).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantize_vision_tower_weights(params: Mapping) -> dict:
    """Replace each ConchVisualModel trunk block's 2-D linear weights
    (qkv/proj/fc1/fc2) with int8 tensors plus `<name>_scale` f32 vectors —
    the layout `TimmViTBlock(quantized=True)` consumes.

    Only the trunk's four per-block linears are quantized: they carry ~85%
    of the extraction FLOPs.  The patch-embed conv, attentional poolers,
    LayerNorms, biases and embeddings keep their float dtypes (pair with
    `cast_vision_tower_weights` for the bf16 patch embed).  Quantize from
    the f32 import BEFORE any bf16 pre-cast so the int8 grid is fit to the
    unrounded weights."""
    params = dict(params)
    if "trunk" not in params:
        raise ValueError("quantize_vision_tower_weights expects a "
                         "ConchVisualModel param tree (no 'trunk' subtree)")
    trunk = dict(params["trunk"])
    for k, v in trunk.items():
        if not k.startswith("block_"):
            continue
        block = dict(v)
        for name in _TRUNK_LINEARS:
            q, s = quantize_rows(block[name])
            block[name] = q
            block[name + "_scale"] = s
        trunk[k] = block
    params["trunk"] = trunk
    return params
