"""End-to-end text-path parity: our rank prompt learner + CONCH tower vs the
reference implementation (loaded with stubbed heavy deps), sharing one random
embedding table and one random text transformer.

This is the foundation of the <=1e-3 incidence-deviation target: identical
prompt splicing, identical pseudo tokens, identical text features.
"""
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available, add_reference_to_path

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


from vlsa_tpu.utils.ref_stubs import install_reference_stubs as _install_stubs  # noqa: F401


@pytest.fixture(scope="module")
def ref_env():
    add_reference_to_path()
    _install_stubs()
    import torch
    from model.prompt_learners import RankPromptLearner as RefRank
    from model.prompt_encoder import CONCHPromptEncoder
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "ref_conch_tf", os.path.join(REFERENCE_ROOT, "model/conch/transformer.py"))
    ref_tf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tf)
    return dict(torch=torch, RefRank=RefRank, CONCHPromptEncoder=CONCHPromptEncoder,
                ref_tf=ref_tf)


WIDTH, HEADS, LAYERS, CTX, VOCAB, OUT = 64, 4, 2, 128, 32007, 48


def _mk_ref_tower(ref_env):
    torch = ref_env["torch"]
    torch.manual_seed(7)
    tt = ref_env["ref_tf"].TextTransformer(
        context_length=CTX, vocab_size=VOCAB, width=WIDTH, heads=HEADS,
        layers=LAYERS, output_dim=OUT, embed_cls=True, output_tokens=False)
    tt.eval()
    return tt


def _mk_ref_encoder(ref_env, tt):
    coca_stub = types.SimpleNamespace(text=tt)
    return ref_env["CONCHPromptEncoDER" if False else "CONCHPromptEncoder"](coca_stub)


def test_rank_prompt_text_feature_parity(ref_env):
    torch = ref_env["torch"]
    from vlsa_tpu.models.tokenizer import Tokenizer
    from vlsa_tpu.models.prompt_build import build_prompt_learner
    from vlsa_tpu.models.text_encoder import TextTower
    from vlsa_tpu.utils.torch_import import import_text_tower_state
    import jax

    tt = _mk_ref_tower(ref_env)
    ref_encoder = _mk_ref_encoder(ref_env, tt)

    tok_ours = Tokenizer(api="CONCH")
    # reference tokenizer facade over the same vocab asset
    sys.path.insert(0, REFERENCE_ROOT)
    from model.utils_vl import Tokenizer as RefTokenizer
    tok_ref = RefTokenizer(api="CONCH")

    emb_table = tt.token_embedding.weight.detach().numpy()

    num_ranks = 6
    cfg = dict(
        num_ranks=num_ranks, num_base_ranks=4, num_tokens_per_rank=4,
        num_context_tokens=8, rank_tokens_position="tail",
        init_prompt_path="vlsa_tpu/assets/tools/survival_prompts.json",
        init_prompt_context_idx=0, init_prompt_rank_idx=0,
        rank_specific_context=False,
    )
    ours = build_prompt_learner("rank", cfg, tok_ours, emb_table,
                                max_num_tokens=CTX - 1, embedding_dim=WIDTH)
    params = ours.init(jax.random.PRNGKey(0))["params"]
    our_embeds = np.asarray(ours.apply({"params": params}))

    ref_learner = ref_env["RefRank"](
        text_config={"max_num_tokens": CTX - 1, "embedding_dim": WIDTH,
                     "embedding_dtype": torch.float32},
        tokenizer=tok_ref,
        token_embedding=tt.token_embedding,
        num_base_ranks=4, num_ranks=num_ranks, num_tokens_per_rank=4,
        num_context_tokens=8, rank_tokens_position="tail",
        init_prompt_path="vlsa_tpu/assets/tools/survival_prompts.json",
        init_prompt_context_idx=0, init_prompt_rank_idx=0,
        rank_specific_context=False, interpolation_type="linear",
    )
    with torch.no_grad():
        ref_embeds = ref_learner().numpy()
    np.testing.assert_allclose(our_embeds, ref_embeds, rtol=1e-5, atol=1e-6,
                               err_msg="sentence embeddings differ")

    # pseudo tokens must be identical
    np.testing.assert_array_equal(np.asarray(ours.pseudo_sentence_tokens),
                                  ref_learner.pseudo_sentence_tokens.numpy())

    # full text features through the (shared-weight) CONCH tower
    with torch.no_grad():
        ref_text = ref_encoder(
            prompts_embedding=torch.tensor(ref_embeds),
            prompts_pseudo_tokens=ref_learner.pseudo_sentence_tokens).numpy()

    tower = TextTower(width=WIDTH, heads=HEADS, layers=LAYERS, context_length=CTX,
                      vocab_size=VOCAB, output_dim=OUT, api="CONCH")
    tower_params = import_text_tower_state(
        {k: v.detach().numpy() for k, v in tt.state_dict().items()}, layers=LAYERS)
    got = tower.apply({"params": tower_params},
                      prompts_embedding=jnp.asarray(our_embeds),
                      prompts_pseudo_tokens=jnp.asarray(
                          np.asarray(ours.pseudo_sentence_tokens)))
    np.testing.assert_allclose(np.asarray(got), ref_text, rtol=5e-4, atol=5e-5,
                               err_msg="text features differ")


def test_clip_bpe_tokenizer_parity(ref_env):
    """Our from-scratch CLIP BPE vs the reference vendored SimpleTokenizer."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "ref_simple_tok", os.path.join(REFERENCE_ROOT, "model/clip/simple_tokenizer.py"))
    ref_st = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_st)
    ref_tok = ref_st.SimpleTokenizer()

    from vlsa_tpu.models.clip_bpe import ClipBPETokenizer
    ours = ClipBPETokenizer()
    texts = [
        "a histopathology image suggesting a very poor prognosis",
        "an H&E stained image associated with a most favorable prognosis!",
        "tumor cells surrounding or invading nerves.",
        "X.",
    ]
    for t in texts:
        assert ours.encode(t) == ref_tok.encode(t), t


@pytest.mark.parametrize("position", ["tail", "front", "middle"])
def test_plain_prompt_learner_parity(ref_env, position):
    """Plain (non-interpolated) learner splicing parity at every rank-token
    position (ref plain_prompt_learner.py:82-120)."""
    torch = ref_env["torch"]
    from model.prompt_learners import PlainPromptLearner as RefPlain
    from model.utils_vl import Tokenizer as RefTokenizer
    from vlsa_tpu.models.tokenizer import Tokenizer
    from vlsa_tpu.models.prompt_build import build_prompt_learner
    import jax

    tt = _mk_ref_tower(ref_env)
    tok_ref = RefTokenizer(api="CONCH")
    tok_ours = Tokenizer(api="CONCH")
    emb_table = tt.token_embedding.weight.detach().numpy()

    kw = dict(num_ranks=4, num_tokens_per_rank=4, num_context_tokens=8,
              rank_tokens_position=position,
              init_prompt_path="vlsa_tpu/assets/tools/survival_prompts.json",
              init_prompt_context_idx=1, init_prompt_rank_idx=1,
              rank_specific_context=False)
    ref_learner = RefPlain(
        text_config={"max_num_tokens": CTX - 1, "embedding_dim": WIDTH,
                     "embedding_dtype": torch.float32},
        tokenizer=tok_ref, token_embedding=tt.token_embedding, **kw)
    with torch.no_grad():
        ref_out = ref_learner().numpy()

    ours = build_prompt_learner("plain", dict(kw), tok_ours, emb_table,
                                max_num_tokens=CTX - 1, embedding_dim=WIDTH)
    params = ours.init(jax.random.PRNGKey(0))["params"]
    got = np.asarray(ours.apply({"params": params}))
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.pseudo_sentence_tokens),
                                  ref_learner.pseudo_sentence_tokens.numpy())
