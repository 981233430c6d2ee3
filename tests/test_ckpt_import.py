"""Import the bundled reference training checkpoint (TCGA-BLCA VLSA) into our
VLSA parameter tree and run inference.

The mount ships only the learnable params (3.4 MB; the frozen CONCH text
tower is excluded by `model_saver_module_filter: prompt_encoder`, ref
assert/blca-train-VLSA/config.yaml) — so this validates the mapping + shapes
and that imported weights drive a coherent incidence function; full-number
parity additionally needs the CONCH `pytorch_model.bin` (not distributable).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.slow

CKPT = os.path.join(REFERENCE_ROOT, "assert/blca-train-VLSA/train_model-last.pth")


@pytest.mark.skipif(not (reference_available() and os.path.exists(CKPT)),
                    reason="bundled checkpoint not available")
def test_import_bundled_blca_checkpoint():
    from vlsa_tpu.models.vlsa_build import build_vlsa
    from vlsa_tpu.utils.torch_import import (
        import_vlsa_learnable_state,
        load_torch_state_dict,
    )

    # configuration of the bundled run (ref assert/blca-train-VLSA/config.yaml):
    # VLFAN + Text/TaskRes queries (12 priors), CoOp-rank prompts, 12 bins
    model, params, _tok = build_vlsa(
        vlsa_api="CONCH",
        text_encoder_cfg={"name": "mahmoodlab/conch", "frozen": True},
        image_encoder_cfg={
            "name": "VLFAN", "dim_in": 512, "dim_hid": 256,
            "use_feat_proj": False, "drop_rate": 0.25, "pred_head": "default",
            "query": "Text", "num_query": 12, "query_pooling": "mean",
            "gated_query": False,
            "query_text_method": "TaskRes", "query_text_res_ratio": 0.5,
            "query_text_load_path": "vlsa_tpu/assets/tools/survival_text_prototypes.json",
            "query_text_load_idx": "tcga_blca_0",
        },
        prompt_learner_cfg={
            "name": "CoOp", "method": "rank", "pretrained": False,
            "num_ranks": 12, "num_base_ranks": 4, "num_tokens_per_rank": 4,
            "num_context_tokens": 8, "rank_tokens_position": "tail",
            "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
            "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
            "rank_specific_context": False,
        },
        rng=jax.random.PRNGKey(0),
        tower_overrides={"width": 768, "heads": 12, "layers": 2},  # short tower: mapping test
    )

    state = load_torch_state_dict(CKPT)
    assert set(state.keys()) == {
        "logit_scale", "prompt_learner.context_embeds", "prompt_learner.rank_embeds",
        "mil_encoder.visual_adapter.weight", "mil_encoder.visual_adapter.bias",
        "mil_encoder.Q.residual_features",
    }
    new_params = import_vlsa_learnable_state(params, state)

    # imported tensors landed with correct values
    np.testing.assert_allclose(
        np.asarray(new_params["prompt_learner"]["rank_embeds"]),
        state["prompt_learner.rank_embeds"])
    np.testing.assert_allclose(
        np.asarray(new_params["query_adapter"]["residual_features"]),
        state["mil_encoder.Q.residual_features"])
    np.testing.assert_allclose(
        np.asarray(new_params["mil_encoder"]["visual_adapter"]["kernel"]),
        state["mil_encoder.visual_adapter.weight"].T)
    assert abs(float(np.asarray(new_params["logit_scale"]))
               - float(state["logit_scale"])) < 1e-6

    # inference with imported weights produces a valid incidence function
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(1, 512, 512)).astype(np.float32))
    mask = jnp.ones((1, 512), bool)
    logits, img, text = model.apply({"params": new_params}, X, mask)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    assert probs.shape == (1, 12)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)
    assert np.isfinite(np.asarray(img)).all()


def test_tower_import_from_released_checkpoint(tmp_path):
    """import_text_tower_from_checkpoint maps a released CoCa-format state
    dict (text.* keys, ref model/conch/coca_model.py:150-245) onto our
    TextTower tree, and the VLSA runner hook consumes it via
    path_clip_model (runner/vlsa.py func_load_model)."""
    import torch
    import jax

    W, H, L, CTX, VOCAB, OUT = 32, 4, 2, 128, 32007, 64
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    state = {
        "text.token_embedding.weight": r(VOCAB, W),
        "text.positional_embedding": r(CTX, W),
        "text.text_projection": r(W, OUT),
        "text.ln_final.weight": torch.ones(W),
        "text.ln_final.bias": torch.zeros(W),
        "text.cls_emb": r(W),
        "logit_scale": torch.tensor(4.0),
    }
    for i in range(L):
        rb = f"text.transformer.resblocks.{i}."
        state.update({
            rb + "ln_1.weight": torch.ones(W), rb + "ln_1.bias": torch.zeros(W),
            rb + "ln_2.weight": torch.ones(W), rb + "ln_2.bias": torch.zeros(W),
            rb + "attn.in_proj_weight": r(3 * W, W),
            rb + "attn.in_proj_bias": torch.zeros(3 * W),
            rb + "attn.out_proj.weight": r(W, W),
            rb + "attn.out_proj.bias": torch.zeros(W),
            rb + "mlp.c_fc.weight": r(4 * W, W),
            rb + "mlp.c_fc.bias": torch.zeros(4 * W),
            rb + "mlp.c_proj.weight": r(W, 4 * W),
            rb + "mlp.c_proj.bias": torch.zeros(W),
        })
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(state, str(ckpt))

    from vlsa_tpu.utils.torch_import import import_text_tower_from_checkpoint
    vl = import_text_tower_from_checkpoint(str(ckpt), api="CONCH")
    assert vl["logit_scale"] == pytest.approx(4.0)
    tp = vl["text_params"]
    assert tp["resblock_1"]["c_fc_weight"].shape == (4 * W, W)
    np.testing.assert_array_equal(
        tp["token_embedding"], state["text.token_embedding.weight"].numpy())

    # runner hook: path_clip_model -> tower weights land in params
    from test_runner_e2e import make_cohort, vlsa_cfg
    from vlsa_tpu.runner import VLSAHandler
    table, split = make_cohort(tmp_path, n_patients=12)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({"path_clip_model": str(tmp_path),
                "_test_tower_overrides": {"width": W, "heads": H, "layers": L,
                                          "output_dim": OUT},
                "vlsa_img_encoder_dim_in": OUT,
                "path_patch": f"synthetic://N=96,D={OUT},seed=3"})
    handler = VLSAHandler(cfg)
    got = np.asarray(dict(handler.params)["prompt_encoder"]["token_embedding"])
    np.testing.assert_array_equal(got, state["text.token_embedding.weight"].numpy())
    np.testing.assert_allclose(
        float(np.asarray(dict(handler.params)["logit_scale"])), 4.0, atol=1e-6)
