"""CoCa caption generation: processor/warper parity + beam search.

Parity targets:
  * the numpy logits processors/warpers vs the exact transformers classes
    the reference wires in (ref model/conch/coca_model.py:275-296);
  * end-to-end top_k / top_p decode sequences vs a torch mirror of the
    reference's generate loop (ref coca_model.py:300-346) driving the REAL
    reference TextTransformer + MultimodalTransformer modules;
  * beam search: the reference's DEFAULT generation_type="beam_search"
    raises ValueError in the vendored copy (GENERATION_TYPES has only
    top_k/top_p, ref coca_model.py:27-37,289-296) so no torch parity target
    exists — instead beam search is verified against brute-force enumeration
    (exhaustive beams => must return the argmax-sum-logprob sequence) and
    against greedy (num_beams=1 degenerates to greedy).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlsa_tpu.models.generation import (
    beam_search, log_softmax, min_length_process,
    repetition_penalty_process, top_k_warp, top_p_warp)

RNG = np.random.default_rng(7)


# ------------------------------------------------------------ warper parity

def _torch_warp(cls_and_args, logits, ids=None):
    import torch
    cls, args = cls_and_args
    w = cls(*args)
    t_ids = torch.zeros((logits.shape[0], 3), dtype=torch.long) \
        if ids is None else torch.tensor(ids)
    return w(t_ids, torch.tensor(logits)).numpy()


def test_top_k_warp_parity():
    from transformers import TopKLogitsWarper
    logits = RNG.normal(size=(5, 40)).astype(np.float32)
    for k in (1, 3, 17, 40, 99):
        want = _torch_warp((TopKLogitsWarper, (k,)), logits)
        got = top_k_warp(logits, k)
        np.testing.assert_array_equal(got, want)


def test_top_p_warp_parity():
    from transformers import TopPLogitsWarper
    logits = RNG.normal(size=(6, 50)).astype(np.float32)
    for p in (0.05, 0.1, 0.5, 0.9, 0.999):
        want = _torch_warp((TopPLogitsWarper, (p,)), logits)
        got = top_p_warp(logits, p)
        np.testing.assert_array_equal(got, want)


def test_repetition_penalty_parity():
    from transformers import RepetitionPenaltyLogitsProcessor
    logits = RNG.normal(size=(4, 30)).astype(np.float32)
    ids = RNG.integers(0, 30, size=(4, 6))
    for pen in (1.0, 1.2, 2.0):
        want = _torch_warp((RepetitionPenaltyLogitsProcessor, (pen,)),
                           logits, ids)
        got = repetition_penalty_process(logits, ids, pen)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_min_length_parity():
    from transformers import MinLengthLogitsProcessor
    logits = RNG.normal(size=(3, 20)).astype(np.float32)
    proc = MinLengthLogitsProcessor(5, eos_token_id=2)
    import torch
    for cur_len in (2, 4, 5, 9):
        ids = torch.zeros((3, cur_len), dtype=torch.long)
        want = proc(ids, torch.tensor(logits)).numpy()
        got = min_length_process(logits, cur_len, 5, 2)
        np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------- beam search

V = 5
SOT, EOS, PAD = 1, 2, 0


def _det_step_fn(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-prefix logits (a stand-in decoder)."""
    out = np.zeros((ids.shape[0], V))
    for r, row in enumerate(ids):
        seed = int(np.sum((row.astype(np.int64) + 3)
                          * (7 ** np.arange(len(row), dtype=np.int64) % 1009))
                   % (2 ** 31))
        out[r] = np.random.default_rng(seed).normal(size=V)
    return out


def test_beam_search_exhaustive_matches_brute_force():
    """With enough beams to cover every live prefix, beam search IS
    exhaustive: it must return the argmax-sum-logprob sequence (eos banned
    via min_seq_len so all sequences share one length)."""
    seq_len = 4  # sot + 3 generated tokens
    got = beam_search(_det_step_fn, batch_size=1, seq_len=seq_len,
                      sot_token_id=SOT, eos_token_id=EOS, pad_token_id=PAD,
                      num_beams=25, num_beam_groups=1, min_seq_len=99)

    best_score, best_seq = -np.inf, None
    for seq in itertools.product(range(V), repeat=seq_len - 1):
        ids, score = [SOT], 0.0
        ok = True
        for tok in seq:
            if tok == EOS:
                ok = False
                break
            lp = log_softmax(_det_step_fn(np.array([ids])))[0]
            score += lp[tok]
            ids.append(tok)
        if ok and score > best_score:
            best_score, best_seq = score, ids
    assert got.shape[1] == seq_len
    np.testing.assert_array_equal(got[0], best_seq)


def test_beam_single_beam_equals_greedy():
    seq_len = 6
    got = beam_search(_det_step_fn, batch_size=2, seq_len=seq_len,
                      sot_token_id=SOT, eos_token_id=EOS, pad_token_id=PAD,
                      num_beams=1, num_beam_groups=1, min_seq_len=99)
    for b in range(2):
        ids = [SOT]
        for _ in range(seq_len - 1):
            lp = log_softmax(_det_step_fn(np.array([ids])))[0]
            lp[EOS] = -np.inf
            ids.append(int(np.argmax(lp)))
        np.testing.assert_array_equal(got[b], ids)


def test_beam_search_eos_and_batch_contract():
    """Batched decode: rows start with sot; eos-terminated; pads only after
    eos; grouped beams run."""
    got = beam_search(_det_step_fn, batch_size=3, seq_len=12,
                      sot_token_id=SOT, eos_token_id=EOS, pad_token_id=PAD,
                      num_beams=6, num_beam_groups=3, min_seq_len=2)
    assert got.shape[0] == 3 and got.shape[1] <= 12
    assert (got[:, 0] == SOT).all()
    for row in got:
        if (row == EOS).any():
            eos_pos = int(np.argmax(row == EOS))
            assert (row[eos_pos + 1:] == PAD).all()


def test_beam_search_diversity_penalty_changes_groups():
    """With a huge diversity penalty, later groups must avoid the token
    group 0 chose at step 1 — verify via a step_fn with one dominant
    token."""
    dom = 3

    def step(ids):
        out = np.full((ids.shape[0], V), -5.0)
        out[:, dom] = 5.0
        out[:, 4] = 2.0
        return out

    seen_first_tokens = set()

    def spy(ids):
        if ids.shape[1] == 2:
            seen_first_tokens.update(ids[:, 1].tolist())
        return step(ids)

    beam_search(spy, batch_size=1, seq_len=4, sot_token_id=SOT,
                eos_token_id=EOS, pad_token_id=PAD, num_beams=4,
                num_beam_groups=2, min_seq_len=99,
                diversity_penalty=100.0)
    assert dom in seen_first_tokens
    assert len(seen_first_tokens - {dom}) >= 1  # another group diverged


# ------------------------------------------------- e2e parity vs reference

def _build_ref_pair():
    """REAL reference torch modules (TextTransformer embed_cls=True +
    MultimodalTransformer) and our imported JAX twins."""
    import torch
    from test_vision_parity import _ref_conch_tf

    from vlsa_tpu.models.multimodal import (MultimodalDecoder,
                                            import_multimodal_state)
    from vlsa_tpu.models.text_encoder import make_text_tower
    from vlsa_tpu.utils.torch_import import import_text_tower_state

    tf = _ref_conch_tf()
    torch.manual_seed(11)
    ref_text = tf.TextTransformer(context_length=24, vocab_size=64,
                                  width=32, heads=4, layers=2,
                                  output_dim=16, embed_cls=True,
                                  output_tokens=True)
    ref_text.eval()
    ref_dec = tf.MultimodalTransformer(width=32, layers=2, heads=4,
                                       context_length=24, output_dim=64)
    with torch.no_grad():
        ref_dec.text_projection.normal_(std=32 ** -0.5)
    ref_dec.eval()

    tower = make_text_tower("CONCH", name=None, width=32, heads=4, layers=2,
                            output_dim=16, vocab_size=64, context_length=24)
    tp = import_text_tower_state(
        {k: v.detach().numpy() for k, v in ref_text.state_dict().items()},
        layers=2)
    dec = MultimodalDecoder(width=32, heads=4, layers=2, context_length=24,
                            output_dim=64)
    dp = import_multimodal_state(
        {k: v.detach().numpy() for k, v in ref_dec.state_dict().items()},
        layers=2, prefix="")
    return ref_text, ref_dec, tower, tp, dec, dp


def _ref_generate_loop(ref_text, ref_dec, img_embs, seq_len, generation_type,
                       top_k, top_p, temperature, repetition_penalty,
                       min_seq_len, sot=1, eos=2, pad=0):
    """Torch mirror of the reference's sampling loop
    (ref model/conch/coca_model.py:300-346), with the REAL transformers
    processors the reference uses."""
    import torch
    import torch.nn.functional as F
    from transformers import (LogitsProcessorList, MinLengthLogitsProcessor,
                              RepetitionPenaltyLogitsProcessor,
                              TopKLogitsWarper, TopPLogitsWarper)

    processors = LogitsProcessorList([
        MinLengthLogitsProcessor(min_seq_len, eos_token_id=eos),
        RepetitionPenaltyLogitsProcessor(repetition_penalty),
    ])
    warper = (TopPLogitsWarper(top_p) if generation_type == "top_p"
              else TopKLogitsWarper(top_k))
    B = img_embs.shape[0]
    out = torch.ones((B, 1), dtype=torch.long) * sot
    with torch.no_grad():
        while True:
            x = out[:, -23:]
            cur_len = x.shape[1]
            _pooled, tokens = ref_text(x)
            logits = ref_dec(img_embs, tokens)[:, -1]
            mask = (out[:, -1] == eos) | (out[:, -1] == pad)
            sample = torch.ones((B, 1), dtype=torch.long) * pad
            if mask.all():
                break
            filt = processors(x[~mask], logits[~mask])
            filt = warper(x[~mask], filt)
            probs = F.softmax(filt / temperature, dim=-1)
            if cur_len + 1 == seq_len:
                sample[~mask] = eos
            else:
                sample[~mask] = torch.multinomial(probs, 1)
            out = torch.cat((out, sample), dim=-1)
            if out.shape[1] >= seq_len:
                break
    return out.numpy()


@pytest.mark.parametrize("generation_type,kws", [
    ("top_k", dict(top_k=1, repetition_penalty=1.3)),
    # tiny temperature makes top_p's multinomial deterministic (the top
    # surviving token gets probability 1.0 in float) on both sides
    ("top_p", dict(top_p=0.1, temperature=1e-3, repetition_penalty=1.3)),
])
def test_coca_generate_e2e_parity(generation_type, kws):
    import torch

    from vlsa_tpu.models.multimodal import coca_generate

    ref_text, ref_dec, tower, tp, dec, dp = _build_ref_pair()
    img = RNG.normal(size=(2, 6, 32)).astype(np.float32)
    seq_len, min_seq_len = 10, 3

    want = _ref_generate_loop(ref_text, ref_dec, torch.tensor(img), seq_len,
                              generation_type, kws.get("top_k", 1),
                              kws.get("top_p", 0.1),
                              kws.get("temperature", 1.0),
                              kws["repetition_penalty"], min_seq_len)
    got = coca_generate(tower, tp, dec, dp, jnp.asarray(img),
                        seq_len=seq_len, min_seq_len=min_seq_len,
                        generation_type=generation_type, **kws)
    # right-pad both to seq_len and compare
    def pad_to(a):
        out = np.zeros((a.shape[0], seq_len), np.int64)
        out[:, :a.shape[1]] = a
        return out
    np.testing.assert_array_equal(pad_to(got), pad_to(want))


def test_coca_generate_beam_default_works():
    """The reference's default generation_type='beam_search' raises in the
    vendored torch copy; ours decodes real captions under the same default."""
    from vlsa_tpu.models.multimodal import coca_generate

    _rt, _rd, tower, tp, dec, dp = _build_ref_pair()
    img = RNG.normal(size=(2, 6, 32)).astype(np.float32)
    caps = coca_generate(tower, tp, dec, dp, jnp.asarray(img), seq_len=9,
                         min_seq_len=2, num_beams=4, num_beam_groups=2)
    assert caps.shape[0] == 2 and caps.shape[1] <= 9
    assert (caps[:, 0] == 1).all()
    with pytest.raises(ValueError, match="generation_type"):
        coca_generate(tower, tp, dec, dp, jnp.asarray(img),
                      generation_type="nucleus")
