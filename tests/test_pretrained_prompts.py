"""CoOp-pretrained prompt warm start: ckpt overrides embeds; fully-frozen
prompts collapse to precomputed text-feature constants
(ref model/vlsa.py:104-124, plain_prompt_learner.py:122-133)."""
import numpy as np
import pytest
import jax

from conftest import reference_available


def _cfgs():
    img = {
        "name": "VLFAN", "dim_in": 32, "dim_hid": 16, "use_feat_proj": False,
        "query": "Parameter", "num_query": 4, "query_pooling": "mean",
    }
    pmt = {
        "name": "CoOp", "method": "rank", "pretrained": True,
        "num_ranks": 5, "num_base_ranks": 4, "num_tokens_per_rank": 4,
        "num_context_tokens": 8, "rank_tokens_position": "tail",
        "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
        "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
        "rank_specific_context": False,
        "frozen_context_embeds": True, "frozen_rank_embeds": True,
    }
    return img, pmt


def test_pretrained_frozen_prompts_collapse_to_constants(tmp_path):
    import torch
    from vlsa_tpu.models.vlsa_build import build_vlsa

    tower_ov = {"width": 32, "heads": 4, "layers": 2, "output_dim": 32}
    img, pmt = _cfgs()

    # first build (not pretrained) to learn the expected embed shapes
    pmt0 = dict(pmt, pretrained=False)
    model0, params0, _ = build_vlsa(
        vlsa_api="CONCH", text_encoder_cfg={"name": "x"},
        image_encoder_cfg=img, prompt_learner_cfg=pmt0,
        rng=jax.random.PRNGKey(0), tower_overrides=tower_ov)
    ctx_shape = np.asarray(params0["prompt_learner"]["context_embeds"]).shape
    rank_shape = np.asarray(params0["prompt_learner"]["rank_embeds"]).shape

    rng = np.random.default_rng(0)
    ckpt = {"model": {
        "prompt_learner.context_embeds": torch.tensor(
            rng.normal(0, 0.02, size=ctx_shape).astype(np.float32)),
        "prompt_learner.rank_embeds": torch.tensor(
            rng.normal(0, 0.02, size=rank_shape).astype(np.float32)),
    }}
    ckpt_path = str(tmp_path / "coop.pth")
    torch.save(ckpt, ckpt_path)

    model, params, _ = build_vlsa(
        vlsa_api="CONCH", text_encoder_cfg={"name": "x"},
        image_encoder_cfg=img, prompt_learner_cfg=pmt,
        pretrained_prompt_learner_cfg={"ckpt": ckpt_path},
        rng=jax.random.PRNGKey(0), tower_overrides=tower_ov)
    # frozen+pretrained: no live prompt learner / text tower in the graph
    assert model.prompt_learner is None
    assert model.prompt_encoder is None
    assert model.pretrained_text_features is not None
    assert np.asarray(model.pretrained_text_features).shape == (5, 32)
    assert "prompt_learner" not in params and "prompt_encoder" not in params


def test_pretrained_unfrozen_prompts_warm_start(tmp_path):
    import torch
    from vlsa_tpu.models.vlsa_build import build_vlsa

    tower_ov = {"width": 32, "heads": 4, "layers": 2, "output_dim": 32}
    img, pmt = _cfgs()
    pmt = dict(pmt, frozen_context_embeds=False, frozen_rank_embeds=False)

    pmt0 = dict(pmt, pretrained=False)
    _, params0, _ = build_vlsa(
        vlsa_api="CONCH", text_encoder_cfg={"name": "x"},
        image_encoder_cfg=img, prompt_learner_cfg=pmt0,
        rng=jax.random.PRNGKey(0), tower_overrides=tower_ov)
    ctx = np.random.default_rng(1).normal(
        0, 0.02, size=np.asarray(params0["prompt_learner"]["context_embeds"]).shape
    ).astype(np.float32)
    rank = np.random.default_rng(2).normal(
        0, 0.02, size=np.asarray(params0["prompt_learner"]["rank_embeds"]).shape
    ).astype(np.float32)
    ckpt_path = str(tmp_path / "coop.pth")
    torch.save({"model": {"prompt_learner.context_embeds": torch.tensor(ctx),
                          "prompt_learner.rank_embeds": torch.tensor(rank)}},
               ckpt_path)

    model, params, _ = build_vlsa(
        vlsa_api="CONCH", text_encoder_cfg={"name": "x"},
        image_encoder_cfg=img, prompt_learner_cfg=pmt,
        pretrained_prompt_learner_cfg={"ckpt": ckpt_path},
        rng=jax.random.PRNGKey(0), tower_overrides=tower_ov)
    np.testing.assert_allclose(
        np.asarray(params["prompt_learner"]["context_embeds"]), ctx)
    np.testing.assert_allclose(
        np.asarray(params["prompt_learner"]["rank_embeds"]), rank)
