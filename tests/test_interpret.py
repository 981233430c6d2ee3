"""Shapley interpretation tests: efficiency axiom + parity with the
reference's coalition-loop implementation."""
import numpy as np
import pytest

from vlsa_tpu.interpret import evaluate_prototype_shap_imp
from vlsa_tpu.interpret.shapley import batched_shapley

from conftest import reference_available, add_reference_to_path

RNG = np.random.default_rng(11)


def test_shapley_efficiency_axiom():
    """Shapley values must sum to v(full) - v(empty)."""
    P, K = 6, 5
    sim = RNG.uniform(-1, 1, size=(P, K)).astype(np.float32)
    ls = 10.0
    shap = evaluate_prototype_shap_imp(sim, ls)
    # v(full)
    probs = np.exp(ls * sim.mean(0) - np.max(ls * sim.mean(0)))
    probs = probs / probs.sum()
    v_full = np.sum((K - np.arange(K)) * probs)
    np.testing.assert_allclose(shap.sum(), v_full - 1.0, rtol=1e-4)


def test_batched_shapley_matches_single():
    P, K, B = 5, 4, 3
    sims = RNG.uniform(-1, 1, size=(B, P, K)).astype(np.float32)
    batched = np.asarray(batched_shapley(sims, 7.0))
    for b in range(B):
        single = evaluate_prototype_shap_imp(sims[b], 7.0)
        np.testing.assert_allclose(batched[b], single, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_shapley_reference_parity():
    add_reference_to_path()
    import importlib.util, os
    # load the reference function without pulling the full handler stack:
    # replicate its module deps (math/np/torch/F) via direct file exec of the
    # two functions would still import runner; instead eval with torch
    import torch
    import torch.nn.functional as F
    import math

    def ref_shap(decoupled_similarity, logit_scale):
        # verbatim-semantics reimplementation of ref model_inference.py:23-79
        # used as an executable golden (the module itself imports the runner)
        sim = torch.from_numpy(np.asarray(decoupled_similarity))
        num_p, num_cls = sim.shape

        def calc_risk(pred_sim):
            prob = F.softmax(logit_scale * pred_sim.mean(dim=0), dim=0)
            return torch.sum((num_cls - torch.arange(0, num_cls)) * prob).item()

        def int2bin(x):
            idx = []
            for i in range(num_p):
                if x % 2 == 1:
                    idx.append(i)
                x //= 2
            return idx

        n_cases = 2 ** num_p
        V = torch.zeros(n_cases)
        for i in range(n_cases):
            if i == 0:
                V[i] = 1.0
                continue
            V[i] = calc_risk(sim[int2bin(i)])
        Fac = [math.factorial(i) for i in range(1 + num_p)]
        W = [Fac[i] * Fac[num_p - i - 1] / Fac[num_p] for i in range(num_p)]
        shap = torch.zeros(num_p)
        for i in range(num_p):
            s = 0.0
            for j in range(n_cases):
                sel = int2bin(j)
                if i in sel:
                    continue
                s += W[len(sel)] * (V[j + 2 ** i] - V[j])
            shap[i] = s
        return shap.numpy()

    P, K = 7, 6
    sim = RNG.uniform(-1, 1, size=(P, K)).astype(np.float32)
    ref = ref_shap(sim, 11.3)
    got = evaluate_prototype_shap_imp(sim, 11.3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_interpret_cohort(tmp_path):
    """Batched cohort attribution over a small synthetic VLSA test split."""
    import sys
    sys.path.insert(0, "tests")
    from test_runner_e2e import make_cohort, vlsa_cfg
    from vlsa_tpu.runner import VLSAHandler
    from vlsa_tpu.interpret.cohort import interpret_cohort
    import os

    table, split = make_cohort(tmp_path, n_patients=16)
    cfg = vlsa_cfg(tmp_path, table, split)
    cfg.update({"epochs": 1, "save_path": str(tmp_path / "res")})
    handler = VLSAHandler(cfg)
    handler.exec()
    test_set = handler.func_prepare_dataset(handler.data_split["test"], "test",
                                            cfg, handler.data_meta)
    out_csv = str(tmp_path / "cohort_shap.csv")
    out = interpret_cohort(handler.model, handler.params, test_set,
                           batch_size=4, min_bucket=64, save_path=out_csv)
    B = len(test_set)
    assert out["shap_importance"].shape[0] == B
    assert out["probs"].shape[0] == B
    assert np.isfinite(out["shap_importance"]).all()
    # probs from the decoupled path are proper distributions
    np.testing.assert_allclose(out["probs"].sum(-1), np.ones(B), rtol=1e-4)
    assert os.path.exists(out_csv)


def _small_abmil_vlsa():
    import jax
    from vlsa_tpu.models.vlsa_build import build_vlsa
    return build_vlsa(
        vlsa_api="CONCH",
        text_encoder_cfg={"name": "mahmoodlab/conch", "frozen": True},
        image_encoder_cfg={
            "name": "DeepMIL", "dim_in": 64, "dim_hid": 32,
            "use_feat_proj": False, "drop_rate": 0.25,
            "pred_head": "Adapter", "pooling": "attention",
        },
        prompt_learner_cfg={
            "name": "CoOp", "method": "rank", "pretrained": False,
            "num_ranks": 4, "num_base_ranks": 2, "num_tokens_per_rank": 2,
            "num_context_tokens": 4, "rank_tokens_position": "tail",
            "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
            "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
            "rank_specific_context": False,
        },
        tower_overrides={"width": 32, "heads": 4, "layers": 2, "output_dim": 64},
        rng=jax.random.PRNGKey(0),
    )


def test_calc_abmil_text_img_similarity():
    """ABMIL interpretation variant (ref utils/model_inference.py:146-178):
    attention is a patch distribution, probs/sims agree with a manual
    recomputation from forward_text_only + encode_instances."""
    import jax
    import jax.numpy as jnp
    from vlsa_tpu.interpret import calc_abmil_text_img_similarity

    model, params, _tok = _small_abmil_vlsa()
    X = np.random.default_rng(0).normal(size=(300, 64)).astype(np.float32)
    out = calc_abmil_text_img_similarity(model, params, X)

    A, probs, sim = out["attention"], out["probs"], out["similarity"]
    assert A.shape == (1, 300) and probs.shape == (1, 4) and sim.shape == (1, 4)
    assert np.all(A >= 0) and np.isclose(A.sum(), 1.0, atol=1e-5)
    assert np.isclose(probs.sum(), 1.0, atol=1e-5)

    # manual recomputation
    tf = model.apply({"params": params}, method=model.forward_text_only)
    tf = np.asarray(tf)
    ntf = tf / np.linalg.norm(tf, axis=-1, keepdims=True)
    feat, raw = model.apply(
        {"params": params},
        method=lambda m: m.encode_instances(
            jnp.asarray(X)[None], jnp.ones((1, 300), bool), ret_with_attn=True))
    feat = np.asarray(feat)
    nf = feat / np.linalg.norm(feat, axis=-1, keepdims=True)
    want_sim = nf @ ntf.T
    np.testing.assert_allclose(sim, want_sim, atol=1e-5)
    ls = out["logit_scale"]
    want_probs = np.exp(ls * want_sim) / np.exp(ls * want_sim).sum()
    np.testing.assert_allclose(probs, want_probs, atol=1e-5)
    want_A = np.exp(raw - np.max(raw)) / np.exp(raw - np.max(raw)).sum()
    np.testing.assert_allclose(A, np.asarray(want_A), atol=1e-5)


def test_abmil_masked_attention_excludes_padding():
    from vlsa_tpu.interpret import calc_abmil_text_img_similarity
    model, params, _tok = _small_abmil_vlsa()
    X = np.random.default_rng(1).normal(size=(1, 64, 64)).astype(np.float32)
    mask = np.ones((1, 64), bool)
    mask[:, 48:] = False
    out = calc_abmil_text_img_similarity(model, params, X, mask=mask)
    assert np.allclose(out["attention"][0, 48:], 0.0)
    assert np.isclose(out["attention"].sum(), 1.0, atol=1e-5)
