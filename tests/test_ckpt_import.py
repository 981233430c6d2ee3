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
