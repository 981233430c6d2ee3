"""VLSA model construction (host orchestration).

Mirrors the wiring of ref model/vlsa.py:22-102 + runner/vlsa_handler.py:87-151:
tokenizer + text tower, CoOp (plain/rank) prompt learner or PromptAdapter,
MIL encoder (VLFAN text queries precomputed through the frozen tower), and the
assembled VLSA module.  Returns (module, params, tokenizer); the text-tower
params used for any precompute are the ones installed in the final tree.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mil import DSMIL, DeepMIL, FeatMIL, VLFAN
from .mil_ext import ILRA, TransMIL
from .prompt_build import build_prompt_adapter, build_prompt_learner
from .text_encoder import make_text_tower
from .tokenizer import Tokenizer
from .vlsa import CLIP_LOGIT_SCALE_INIT, VLSA


def _fetch(cfg: dict, prefix: str) -> dict:
    out = {}
    for k, v in cfg.items():
        if k.startswith(prefix + "_"):
            out[k[len(prefix) + 1:]] = v
    return out


def build_mil_encoder(image_encoder_cfg: dict):
    """MIL encoder from the image-encoder config (ref model/utils_vl.py:128-147)."""
    name = image_encoder_cfg["name"]
    common = dict(
        dim_in=image_encoder_cfg.get("dim_in", 512),
        dim_hid=image_encoder_cfg.get("dim_hid", 256),
        use_feat_proj=image_encoder_cfg.get("use_feat_proj", False),
        drop_rate=image_encoder_cfg.get("drop_rate", 0.25),
    )
    if name == "VLFAN":
        return VLFAN(
            **common,
            query=image_encoder_cfg.get("query", "Parameter"),
            num_query=int(image_encoder_cfg.get("num_query") or 10),
            gated_query=bool(image_encoder_cfg.get("gated_query", False)),
            query_pooling=image_encoder_cfg.get("query_pooling", "mean"),
            pred_head=image_encoder_cfg.get("pred_head", "default"),
        )
    if name == "FeatMIL":
        return FeatMIL(pooling=image_encoder_cfg.get("feat_pooling", "identity"))
    if name == "DeepMIL":
        return DeepMIL(**common, num_cls=image_encoder_cfg.get("num_cls", 2),
                       pooling=image_encoder_cfg.get("mil_pooling", "attention"),
                       pred_head=image_encoder_cfg.get("pred_head", "default"),
                       dim_reduction=image_encoder_cfg.get("dim_reduction", 4),
                       keep_ratio=image_encoder_cfg.get("keep_ratio", 0.8))
    if name == "DSMIL":
        return DSMIL(**common, num_cls=image_encoder_cfg.get("num_cls", 2))
    if name == "TransMIL":
        return TransMIL(dim_in=common["dim_in"], dim_hid=common["dim_hid"],
                        num_cls=image_encoder_cfg.get("num_cls", 2))
    if name == "ILRA":
        return ILRA(dim_in=common["dim_in"], dim_hid=common["dim_hid"],
                    num_cls=image_encoder_cfg.get("num_cls", 2))
    raise ValueError(f"Got an invalid MIL encoder name: {name}.")


def build_vlsa(
    vlsa_api: str,
    text_encoder_cfg: dict,
    image_encoder_cfg: dict,
    prompt_learner_cfg: dict,
    pretrained_prompt_learner_cfg: Optional[dict] = None,
    path_clip_model: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    vl_weights: Optional[dict] = None,
    tower_overrides: Optional[dict] = None,
    **_,
):
    """Construct the VLSA module + initialised params.

    `vl_weights`, when provided, is a pytree for the text tower (imported from
    a torch CONCH/CLIP checkpoint via utils.torch_import); otherwise the tower
    is randomly initialised (architecture-faithful, weights not distributable
    in this environment).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rng, rng_tower, rng_model = jax.random.split(rng, 3)

    overrides = dict(tower_overrides or {})
    # config surface: `vlsa_txt_encoder_dtype: bfloat16` selects bf16 MXU
    # compute in the tower (f32 accumulation/softmax; see text_encoder.py);
    # `vlsa_txt_encoder_scan_layers: true` scans stacked layer params
    # (collapses the tower's XLA op count ~12x, same math)
    if text_encoder_cfg.get("dtype") and "dtype" not in overrides:
        overrides["dtype"] = text_encoder_cfg["dtype"]
    if text_encoder_cfg.get("scan_layers") and "scan_layers" not in overrides:
        overrides["scan_layers"] = bool(text_encoder_cfg["scan_layers"])
    tower = make_text_tower(vlsa_api, name=None, **overrides)
    tokenizer = Tokenizer(root=path_clip_model, name=text_encoder_cfg.get("name"),
                          api=vlsa_api, context_length=tower.context_length)

    # init (or import) the frozen text-tower params first: any text-feature
    # precompute must use the same weights that end up in the final tree
    L = tower.max_num_tokens
    dummy_emb = jnp.zeros((2, L, tower.width))
    dummy_pseudo = jnp.zeros((2, L), jnp.int32).at[:, :4].set(jnp.arange(1, 5))
    # build-time computations are jitted: eager op-by-op dispatch is very
    # slow on remote TPU backends
    tower_params = jax.jit(tower.init)(rng_tower, prompts_embedding=dummy_emb,
                                       prompts_pseudo_tokens=dummy_pseudo)["params"]
    if vl_weights is not None:
        tower_params = vl_weights["text_params"] if "text_params" in vl_weights else vl_weights
        if tower.scan_layers and "resblock_0" in tower_params:
            # imported checkpoints arrive in the per-layer layout
            from .text_encoder import stack_resblock_params
            tower_params = stack_resblock_params(tower_params)
    emb_table = np.asarray(tower_params["token_embedding"])

    _encode_jit = None

    def encode_texts(token_ids):
        token_ids = np.asarray(token_ids)
        pseudo = None
        from .text_encoder import generate_pseudo_tokens
        ids_for_pseudo = token_ids[:, :-1] if vlsa_api == "CONCH" else token_ids
        pseudo = generate_pseudo_tokens(ids_for_pseudo, vlsa_api,
                                        eos_token_id=tokenizer.eos_token_id)
        fn = jax.jit(lambda p, ids, ps: tower.apply(
            {"params": p}, prompts_text=ids, prompts_pseudo_tokens=ps))
        return np.asarray(fn(tower_params, jnp.asarray(token_ids),
                             jnp.asarray(pseudo)))

    logit_scale_init = CLIP_LOGIT_SCALE_INIT
    if vl_weights is not None and "logit_scale" in vl_weights:
        logit_scale_init = float(vl_weights["logit_scale"])

    # --- language end (ref model/vlsa.py:51-67) ---
    pmt_name = prompt_learner_cfg["name"]
    prompt_learner = None
    prompt_adapter = None
    pretrained_text_features = None
    if pmt_name == "CoOp":
        coop_cfg = dict(prompt_learner_cfg)
        if prompt_learner_cfg.get("pretrained"):
            assert pretrained_prompt_learner_cfg is not None
            import torch
            ckpt = torch.load(pretrained_prompt_learner_cfg["ckpt"],
                              map_location="cpu", weights_only=False)
            coop_cfg["_ctx_override"] = ckpt["model"]["prompt_learner.context_embeds"].numpy()
            coop_cfg["_rank_override"] = ckpt["model"]["prompt_learner.rank_embeds"].numpy()
        prompt_learner = build_prompt_learner(
            coop_cfg.get("method", "rank"), coop_cfg, tokenizer, emb_table,
            L, tower.width)
        if "_ctx_override" in coop_cfg:
            # warm-start from a CoOp-pretrained checkpoint
            # (ref plain_prompt_learner.py:122-133)
            prompt_learner = prompt_learner.clone(
                context_init=coop_cfg["_ctx_override"], rank_init=coop_cfg["_rank_override"])
        if (prompt_learner_cfg.get("pretrained")
                and prompt_learner_cfg.get("frozen_context_embeds")
                and prompt_learner_cfg.get("frozen_rank_embeds")):
            lp = jax.jit(prompt_learner.init)(rng)["params"]
            embeds = jax.jit(prompt_learner.apply)({"params": lp})
            pretrained_text_features = np.asarray(jax.jit(tower.apply)(
                {"params": tower_params}, prompts_embedding=embeds,
                prompts_pseudo_tokens=jnp.asarray(prompt_learner.pseudo_sentence_tokens)))
            prompt_learner = None
    elif pmt_name == "Adapter":
        adapter_cfg = dict(prompt_learner_cfg)
        adapter_cfg["num_prompts"] = prompt_learner_cfg["num_ranks"]
        prompt_adapter = build_prompt_adapter(adapter_cfg, tokenizer, encode_texts)
    else:
        raise ValueError(f"{pmt_name} is not a valid name of prompt learner.")

    # --- vision end (ref model/vlsa.py:69-96) ---
    mil_encoder = build_mil_encoder(image_encoder_cfg)
    query_adapter = None
    if image_encoder_cfg.get("name") == "VLFAN" and image_encoder_cfg.get("query") == "Text":
        q_cfg = _fetch(image_encoder_cfg, "query_text")
        q_cfg.update({
            "num_prompts": int(image_encoder_cfg.get("num_query") or 10),
            "load_negative_prompts": bool(image_encoder_cfg.get("gated_query", False)),
        })
        query_adapter = build_prompt_adapter(q_cfg, tokenizer, encode_texts)

    # exact-safe prompt trimming (see VLSA.text_trim_len): keep the longest
    # real sentence + 1 trailing pad (the reference's cls mask marks the slot
    # after the last real token as a valid key, prompt_encoder.py:27-32 of
    # model/conch via open_clip's off-by-one), rounded up for sublane tiling
    text_trim_len = None
    if prompt_learner is not None and prompt_learner_cfg.get("trim_prompts", True):
        pseudo_np = np.asarray(prompt_learner.pseudo_sentence_tokens)
        max_real = int(pseudo_np.max())
        trim = min(-(-(max_real + 1) // 8) * 8, tower.max_num_tokens)
        if trim < tower.max_num_tokens:
            text_trim_len = trim

    model = VLSA(
        # the tower is only a live submodule when the CoOp path runs through
        # it at every step; Adapter/frozen paths precompute on host
        prompt_encoder=tower if prompt_learner is not None else None,
        mil_encoder=mil_encoder,
        prompt_learner=prompt_learner,
        prompt_adapter=prompt_adapter,
        query_adapter=query_adapter,
        pooling=image_encoder_cfg.get("pooling", "logit_mean"),
        logit_scale_init=logit_scale_init,
        pretrained_text_features=pretrained_text_features,
        text_trim_len=text_trim_len,
    )

    D = image_encoder_cfg.get("dim_in", 512)
    dummy_x = jnp.zeros((1, 256, D), jnp.float32)
    dummy_m = jnp.ones((1, 256), bool)
    params = jax.jit(model.init)(rng_model, dummy_x, dummy_m)["params"]
    if "prompt_encoder" in params:
        params = dict(params)
        params["prompt_encoder"] = tower_params
    return model, params, tokenizer
