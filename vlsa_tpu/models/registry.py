"""Model registry: string -> constructed model (ref model/utils.py:13-36).

For DeepMIL-family networks returns `(module, params)` from `dims` +
`network`; for VLSA delegates to `vlsa_build.build_vlsa` which returns
`(module, params, tokenizer)`.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from .mil import DSMIL, DeepMIL
from .mil_ext import BatchedPatchGCN, DeepAttnMISL, ILRA, PatchGCN, TransMIL
from .vlsa_build import build_vlsa


def _init(module, rng, dims, example_n=256, extra=None):
    x = jnp.zeros((1, example_n, dims[0]), jnp.float32)
    m = jnp.ones((1, example_n), bool)
    if extra == "cluster":
        cid = jnp.zeros((1, example_n), jnp.int32)
        params = module.init(rng, x, mask=m, cluster_id=cid)["params"]
    elif extra == "graph":
        edge_index = jnp.zeros((2, 4), jnp.int32)
        params = module.init(rng, x[0], edge_index, m[0])["params"]
    else:
        params = module.init(rng, x, m)["params"]
    return module, params


def load_model(arch: str, dims: Optional[List] = None, rng=None, **kws):
    rng = rng if rng is not None else jax.random.PRNGKey(kws.get("seed", 0))
    if arch == "DeepMIL":
        assert "network" in kws, "Please specify a network for a DeepMIL arch."
        network = kws["network"]
        common = dict(dim_in=dims[0], dim_hid=dims[1], num_cls=dims[2])
        opt = {k: v for k, v in kws.items()
               if k in ("use_feat_proj", "drop_rate", "pred_head",
                        "dim_reduction", "keep_ratio")}
        if network == "ABMIL":
            pooling = kws.get("pooling", "attention")
            assert pooling in ("attention", "gated_attention")
            return _init(DeepMIL(**common, pooling=pooling, **opt), rng, dims)
        if network == "MaxMIL":
            return _init(DeepMIL(**common, pooling="max", **opt), rng, dims)
        if network == "MeanMIL":
            return _init(DeepMIL(**common, pooling="mean", **opt), rng, dims)
        if network == "DSMIL":
            return _init(DSMIL(**common,
                               **{k: v for k, v in opt.items()
                                  if k in ("use_feat_proj", "drop_rate")}), rng, dims)
        if network == "TransMIL":
            return _init(TransMIL(**common), rng, dims)
        if network == "ILRA":
            return _init(ILRA(**common, num_layers=kws.get("num_layers", 2),
                              num_heads=kws.get("num_heads", 8),
                              topk=kws.get("topk", 1), ln=kws.get("ln", False)), rng, dims)
        if network == "DeepAttnMISL":
            return _init(DeepAttnMISL(**common,
                                      num_clusters=kws.get("num_clusters", 8),
                                      dropout=kws.get("dropout", 0.25)),
                         rng, dims, extra="cluster")
        if network == "PatchGCN":
            module = BatchedPatchGCN(dim_in=dims[0], dim_hid=dims[1],
                                     num_cls=dims[2],
                                     num_layers=kws.get("num_layers", 3),
                                     dropout=kws.get("dropout", 0.25))
            x = jnp.zeros((1, 64, dims[0]), jnp.float32)
            ei = jnp.zeros((1, 2, 8), jnp.int32)
            m = jnp.ones((1, 64), bool)
            ev = jnp.ones((1, 8), bool)
            params = module.init(rng, x, mask=m, edge_index=ei, edge_valid=ev)["params"]
            return module, params
        raise NotImplementedError(f"unknown DeepMIL network {network}")
    if arch == "VLSA":
        return build_vlsa(rng=rng, **kws)
    raise NotImplementedError(f"Backbone {arch} cannot be recognized")
