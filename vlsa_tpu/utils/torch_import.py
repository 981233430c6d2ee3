"""Torch-checkpoint importers: reference state dicts -> Flax param pytrees.

Two surfaces:
  * `import_text_tower_state` — CONCH/CLIP text-tower weights (e.g. from
    mahmoodlab/conch `pytorch_model.bin`) into our `TextTower` params
    (torch layout is preserved in our params, so most entries map 1:1).
  * `import_vlsa_learnable_state` — the reference's learnable-params-only
    training checkpoint (ref runner/base_handler.py:641-683; e.g.
    assert/blca-train-VLSA/train_model-last.pth) into an existing VLSA param
    tree: logit_scale, prompt-learner context/rank embeds, VLFAN visual
    adapter, TaskRes query residuals.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: np.ndarray} (torch CPU as reader)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out = {}
    for k, v in state.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().float().numpy()
    return out


def import_text_tower_state(state: Dict[str, np.ndarray], layers: int,
                            prefix: str = "") -> dict:
    """Map torch TextTransformer keys (ref model/conch/transformer.py:325-449 /
    model/clip/model.py text path) to our TextTower param tree."""
    g = lambda k: np.asarray(state[prefix + k])
    params: dict = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "text_projection": g("text_projection"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
    }
    if prefix + "cls_emb" in state:
        params["cls_emb"] = g("cls_emb")
    for i in range(layers):
        rb = f"transformer.resblocks.{i}."
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
    return params


def import_vlsa_learnable_state(params: dict, state: Dict[str, np.ndarray]) -> dict:
    """Overlay the reference's learnable-parameter checkpoint onto a VLSA
    param tree built by `build_vlsa`.  Returns a new tree.

    Mapping (reference name -> ours):
      logit_scale                        -> logit_scale
      prompt_learner.context_embeds      -> prompt_learner/context_embeds
      prompt_learner.rank_embeds         -> prompt_learner/rank_embeds
      mil_encoder.visual_adapter.weight  -> mil_encoder/visual_adapter/kernel (T)
      mil_encoder.visual_adapter.bias    -> mil_encoder/visual_adapter/bias
      mil_encoder.Q.residual_features    -> query_adapter/residual_features
      mil_encoder.Q.neg_residual_features-> query_adapter/neg_residual_features
      mil_encoder.Q (parameter query)    -> mil_encoder/Q
      mil_encoder.feat_proj.*            -> mil_encoder/feat_proj/...
    """
    import copy
    params = copy.deepcopy(jax_tree_to_dict(params))

    def setp(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for k, v in state.items():
        if k == "logit_scale":
            setp(("logit_scale",), v)
        elif k == "prompt_learner.context_embeds":
            setp(("prompt_learner", "context_embeds"), v)
        elif k == "prompt_learner.rank_embeds":
            setp(("prompt_learner", "rank_embeds"), v)
        elif k == "mil_encoder.visual_adapter.weight":
            setp(("mil_encoder", "visual_adapter", "kernel"), v.T)
        elif k == "mil_encoder.visual_adapter.bias":
            setp(("mil_encoder", "visual_adapter", "bias"), v)
        elif k == "mil_encoder.Q.residual_features":
            setp(("query_adapter", "residual_features"), v)
        elif k == "mil_encoder.Q.neg_residual_features":
            setp(("query_adapter", "neg_residual_features"), v)
        elif k == "mil_encoder.Q":
            setp(("mil_encoder", "Q"), v)
        elif k == "mil_encoder.feat_proj.projecter.0.weight":
            setp(("mil_encoder", "feat_proj", "linear", "kernel"), v.T)
        elif k == "mil_encoder.feat_proj.projecter.0.bias":
            setp(("mil_encoder", "feat_proj", "linear", "bias"), v)
        elif k == "mil_encoder.feat_proj.projecter.1.weight":
            setp(("mil_encoder", "feat_proj", "norm", "scale"), v)
        elif k == "mil_encoder.feat_proj.projecter.1.bias":
            setp(("mil_encoder", "feat_proj", "norm", "bias"), v)
        elif k == "mil_encoder.query_pooling":
            setp(("mil_encoder", "query_pool_weight"), v)
        else:
            print(f"[torch_import] warning: unmapped key {k} (shape {v.shape})")
    return params


def jax_tree_to_dict(tree):
    """FrozenDict / dict pytree -> plain nested dict of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return np.asarray(tree)


def import_deepmil_state(state: Dict[str, np.ndarray]) -> dict:
    """Map a reference DeepMIL/ABMIL checkpoint (ref model/deepmil.py:222-292,
    layers.py:125-153) to our DeepMIL param tree."""
    params: dict = {}

    def setp(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    for k, v in state.items():
        if k == "feat_proj.projecter.0.weight":
            setp(("feat_proj", "linear", "kernel"), v.T)
        elif k == "feat_proj.projecter.0.bias":
            setp(("feat_proj", "linear", "bias"), v)
        elif k == "feat_proj.projecter.1.weight":
            setp(("feat_proj", "norm", "scale"), v)
        elif k == "feat_proj.projecter.1.bias":
            setp(("feat_proj", "norm", "bias"), v)
        elif k == "sigma.attention.0.weight":
            setp(("sigma", "fc1_kernel"), v.T)
        elif k == "sigma.attention.0.bias":
            setp(("sigma", "fc1_bias"), v)
        elif k == "sigma.attention.2.weight":
            setp(("sigma", "fc2_kernel"), v.T)
        elif k == "sigma.attention.2.bias":
            setp(("sigma", "fc2_bias"), v)
        # gated attention pooling (ref layers.py:85-122)
        elif k == "sigma.fc1.0.weight":
            setp(("sigma", "fc1", "kernel"), v.T)
        elif k == "sigma.fc1.0.bias":
            setp(("sigma", "fc1", "bias"), v)
        elif k == "sigma.score.0.weight":
            setp(("sigma", "score", "kernel"), v.T)
        elif k == "sigma.score.0.bias":
            setp(("sigma", "score", "bias"), v)
        elif k == "sigma.fc2.weight":
            setp(("sigma", "fc2", "kernel"), v.T)
        elif k == "sigma.fc2.bias":
            setp(("sigma", "fc2", "bias"), v)
        elif k == "g.weight":
            setp(("g", "kernel"), v.T)
        elif k == "g.bias":
            setp(("g", "bias"), v)
        elif k.startswith("visual_adapter.fc.0."):
            setp(("visual_adapter", "fc1", "kernel"), v.T)
        elif k.startswith("visual_adapter.fc.2."):
            setp(("visual_adapter", "fc2", "kernel"), v.T)
        else:
            print(f"[torch_import] warning: unmapped DeepMIL key {k}")
    return params


def import_text_tower_from_checkpoint(path: str, api: str = "CONCH") -> dict:
    """Load the frozen VL text tower from a released checkpoint file
    (e.g. mahmoodlab/conch `pytorch_model.bin`, a CoCa state dict whose text
    tower lives under `text.*` — ref model/conch/coca_model.py:150-245; CLIP
    checkpoints keep text keys at the top level).  Returns the `vl_weights`
    dict accepted by models.vlsa_build.build_vlsa.
    """
    state = load_torch_state_dict(path)
    prefix = ""
    if any(k.startswith("text.") for k in state):
        prefix = "text."
    layer_ids = [int(k.split("resblocks.")[1].split(".")[0])
                 for k in state if (prefix + "transformer.resblocks.") in k]
    assert layer_ids, f"no text-transformer blocks found in {path}"
    layers = max(layer_ids) + 1
    out = {"text_params": import_text_tower_state(state, layers=layers,
                                                  prefix=prefix)}
    if "logit_scale" in state:
        out["logit_scale"] = float(np.asarray(state["logit_scale"]).reshape(())) 
    return out
