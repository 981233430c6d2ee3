"""Model-layer tests: coattn op, MIL mask invariance, text-tower parity vs the
reference torch TextTransformer (loaded standalone), and VLSA assembly."""
import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vlsa_tpu.ops import coattn_pool, coattn_pool_reference, masked_topk_mean
from vlsa_tpu.models import VLFAN, DeepMIL, DSMIL, FeatMIL, logit_pooling
from vlsa_tpu.models.text_encoder import TextTower, generate_pseudo_tokens
from vlsa_tpu.utils.torch_import import import_text_tower_state

from conftest import REFERENCE_ROOT, reference_available

RNG = np.random.default_rng(0)


def load_ref_file(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REFERENCE_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bag(B=2, N=64, D=32):
    x = RNG.normal(size=(B, N, D)).astype(np.float32)
    mask = np.ones((B, N), bool)
    return jnp.array(x), jnp.array(mask)


def test_coattn_reference_matches_naive():
    P, B, N, C = 5, 2, 48, 16
    q = jnp.array(RNG.normal(size=(P, C)).astype(np.float32))
    x, mask = _bag(B, N, C)
    out = coattn_pool_reference(q, x, mask, 10.0)
    # naive per-batch
    xn = np.asarray(x) / np.linalg.norm(np.asarray(x), axis=-1, keepdims=True)
    for b in range(B):
        logits = 10.0 * np.asarray(q) @ xn[b].T
        a = np.exp(logits - logits.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out)[b], a @ np.asarray(x)[b],
                                   rtol=1e-4, atol=1e-5)


def test_coattn_mask_invariance():
    P, C = 4, 16
    q = jnp.array(RNG.normal(size=(P, C)).astype(np.float32))
    x_small, _ = _bag(1, 32, C)
    x_pad = jnp.concatenate([x_small, jnp.zeros((1, 32, C))], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 32), bool), jnp.zeros((1, 32), bool)], axis=1)
    a = coattn_pool(q, x_small, None, 5.0)
    b = coattn_pool(q, x_pad, mask, 5.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_coattn_grads_match_reference():
    P, C = 3, 8
    q = jnp.array(RNG.normal(size=(P, C)).astype(np.float32))
    x, mask = _bag(2, 16, C)

    def loss_ref(q_, x_):
        return jnp.sum(coattn_pool_reference(q_, x_, mask, 7.0) ** 2)

    def loss_op(q_, x_):
        return jnp.sum(coattn_pool(q_, x_, mask, 7.0) ** 2)

    g1 = jax.grad(loss_ref, argnums=(0, 1))(q, x)
    g2 = jax.grad(loss_op, argnums=(0, 1))(q, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_logit_pooling_variants():
    N, C = 20, 4
    logits = jnp.array(RNG.normal(size=(N, C)).astype(np.float32))
    mask = jnp.array([True] * 15 + [False] * 5)
    ref = np.asarray(logits)[:15]
    _, mean_p = logit_pooling(logits, "logit_mean", mask)
    np.testing.assert_allclose(np.asarray(mean_p), ref.mean(0), rtol=1e-5)
    _, max_p = logit_pooling(logits, "logit_max", mask)
    np.testing.assert_allclose(np.asarray(max_p), ref.max(0), rtol=1e-5)
    _, top5 = logit_pooling(logits, "logit_top5", mask)
    expect = np.sort(ref, axis=0)[::-1][:5].mean(0)
    np.testing.assert_allclose(np.asarray(top5), expect, rtol=1e-5)
    # topk larger than valid count clamps
    _, top50 = logit_pooling(logits, "logit_top50", mask)
    np.testing.assert_allclose(np.asarray(top50), ref.mean(0), rtol=1e-5)


@pytest.mark.parametrize("pooling", ["attention", "gated_attention", "mean", "max"])
def test_deepmil_mask_invariance(pooling):
    x, _ = _bag(2, 40, 24)
    model = DeepMIL(dim_in=24, dim_hid=16, num_cls=3, pooling=pooling, use_feat_proj=True)
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((2, 40), bool))["params"]
    out_full = model.apply({"params": params}, x, jnp.ones((2, 40), bool))
    x_pad = jnp.concatenate([x, 100.0 * jnp.ones((2, 24, 24))], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 40), bool), jnp.zeros((2, 24), bool)], axis=1)
    out_pad = model.apply({"params": params}, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pad), rtol=2e-4, atol=1e-5)


def test_vlfan_mask_invariance_and_divloss():
    x, _ = _bag(2, 40, 24)
    model = VLFAN(dim_in=24, dim_hid=16, use_feat_proj=False, query="Parameter",
                  num_query=6, query_pooling="mean")
    params = model.init(jax.random.PRNGKey(1), x, jnp.ones((2, 40), bool))["params"]
    out_full = model.apply({"params": params}, x, jnp.ones((2, 40), bool))
    x_pad = jnp.concatenate([x, jnp.ones((2, 24, 24))], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 40), bool), jnp.zeros((2, 24), bool)], axis=1)
    out_pad = model.apply({"params": params}, x_pad, mask)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_pad), rtol=2e-4, atol=1e-5)
    div = model.apply({"params": params}, method=lambda m: m.query_div_loss())
    assert np.isfinite(float(div))
    # attention output shape
    feats, attn = model.apply({"params": params}, x, jnp.ones((2, 40), bool),
                              ret_with_attn=True)
    assert attn.shape == (2, 6, 40)


def test_dsmil_smoke():
    x, mask = _bag(2, 30, 24)
    model = DSMIL(dim_in=24, dim_hid=16, num_cls=3, use_feat_proj=False)
    params = model.init(jax.random.PRNGKey(2), x, mask)["params"]
    out = model.apply({"params": params}, x, mask)
    assert out.shape == (2, 3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_conch_text_tower_parity():
    """Random-weight parity: torch TextTransformer (reference CONCH file) vs
    our TextTower with imported weights, token-id path with padding."""
    import torch
    ref_tf = load_ref_file("model/conch/transformer.py", "ref_conch_transformer")
    torch.manual_seed(0)
    tt = ref_tf.TextTransformer(
        context_length=16, vocab_size=50, width=32, heads=4, layers=2,
        output_dim=24, embed_cls=True, output_tokens=False)
    tt.eval()

    tower = TextTower(width=32, heads=4, layers=2, context_length=16,
                      vocab_size=50, output_dim=24, api="CONCH")
    params = import_text_tower_state(
        {k: v.detach().numpy() for k, v in tt.state_dict().items()}, layers=2)

    # token ids [B, 15]: sot, tokens, eot, pads  (pad_id=0)
    ids = np.zeros((3, 15), np.int64)
    for i, n in enumerate([5, 9, 13]):
        ids[i, 0] = 2
        ids[i, 1:n] = RNG.integers(3, 50, size=n - 1)
        ids[i, n] = 1  # eot marker position (any nonzero works for pad logic)
    with torch.no_grad():
        ref_out = tt(torch.tensor(ids)).numpy()
    got = tower.apply({"params": params}, prompts_text=jnp.asarray(
        np.concatenate([ids, np.zeros((3, 1), np.int64)], axis=1)))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_clip_text_tower_parity():
    """Random-weight parity vs the reference CLIP text encoder path."""
    import torch
    ref_clip = load_ref_file("model/clip/model.py", "ref_clip_model")
    torch.manual_seed(1)
    m = ref_clip.CLIP(
        embed_dim=24, image_resolution=32, vision_layers=1, vision_width=64,
        vision_patch_size=16, context_length=16, vocab_size=60,
        transformer_width=32, transformer_heads=4, transformer_layers=2)
    m = m.float()
    m.eval()

    tower = TextTower(width=32, heads=4, layers=2, context_length=16,
                      vocab_size=60, output_dim=24, api="CLIP")
    state = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
    params = import_text_tower_state(state, layers=2)

    ids = np.zeros((2, 16), np.int64)
    for i, n in enumerate([6, 12]):
        ids[i, 0] = 1
        ids[i, 1:n] = RNG.integers(2, 58, size=n - 1)
        ids[i, n] = 59  # eot = highest token id
    with torch.no_grad():
        ref_out = m.encode_text(torch.tensor(ids)).numpy()
    got = tower.apply({"params": params}, prompts_text=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-4, atol=2e-5)


def test_coattn_pallas_kernels_interpret():
    """Fused fwd+bwd Pallas kernels vs the XLA reference, in interpreter mode
    (runs on CPU; the same code path compiles on TPU)."""
    import vlsa_tpu.ops.coattn as co
    old = co.INTERPRET
    co.INTERPRET = True
    try:
        rng = np.random.default_rng(0)
        P, B, N, C = 5, 2, 512, 32
        q = jnp.asarray(rng.normal(size=(P, C)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        mask = jnp.asarray(np.concatenate(
            [np.ones((B, N - 100)), np.zeros((B, 100))], 1).astype(bool))
        out_k = co._coattn_pool_tpu(q, x, mask, jnp.float32(20.0))
        out_r = co.coattn_pool_reference(q, x, mask, 20.0)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)
        g_k = jax.grad(lambda q_, x_: jnp.sum(
            co._coattn_pool_tpu(q_, x_, mask, jnp.float32(20.0)) ** 2),
            argnums=(0, 1))(q, x)
        g_r = jax.grad(lambda q_, x_: jnp.sum(
            co.coattn_pool_reference(q_, x_, mask, 20.0) ** 2),
            argnums=(0, 1))(q, x)
        for a, b in zip(g_k, g_r):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4
    finally:
        co.INTERPRET = old


def test_vlfan_gated_query_algebra():
    """Gated query: logits = (Qn_i - Qn_gate) . Xn — folding the gate into
    the query matrix (linear) must equal explicit subtraction
    (ref deepmil.py:192-197)."""
    P, C, N = 5, 16, 32
    x, mask = _bag(1, N, C)
    model = VLFAN(dim_in=C, dim_hid=8, use_feat_proj=False, query="Parameter",
                  num_query=P, gated_query=True, query_pooling="mean")
    params = model.init(jax.random.PRNGKey(3), x, mask)["params"]
    out = model.apply({"params": params}, x, mask)
    # explicit computation
    from vlsa_tpu.ops.masked import l2_normalize
    Q = np.asarray(params["Q"])           # [P+1, C]
    Qn = np.asarray(l2_normalize(jnp.asarray(Q), axis=-1))
    xn = np.asarray(x[0]) / np.linalg.norm(np.asarray(x[0]), axis=-1, keepdims=True)
    A_ = Qn @ xn.T                         # [P+1, N]
    A_g = (A_[:P] - A_[P:]) * model.coattn_logit_scale
    A = np.exp(A_g - A_g.max(-1, keepdims=True))
    A = A / A.sum(-1, keepdims=True)
    pooled = (A @ np.asarray(x[0])).mean(0)
    W = np.asarray(params["visual_adapter"]["kernel"])
    b = np.asarray(params["visual_adapter"]["bias"])
    expect = pooled @ W + b
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-3, atol=1e-4)
    # div loss uses the gate-vs-priors similarity (ref deepmil.py:160-163)
    div = model.apply({"params": params}, method=lambda m: m.query_div_loss())
    expect_div = np.abs(Qn[-1:] @ Qn[:-1].T).mean()
    np.testing.assert_allclose(float(div), expect_div, rtol=1e-4)


def test_abmil_fused_kernel_interpret():
    """Fused ABMIL pooling kernel vs the reference path (interpreter mode)."""
    import vlsa_tpu.ops.abmil as ab
    old = ab.INTERPRET
    ab.INTERPRET = True
    try:
        rng = np.random.default_rng(1)
        B, N, D, H = 2, 512, 32, 16
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        mask = jnp.asarray(np.concatenate(
            [np.ones((B, N - 64)), np.zeros((B, 64))], 1).astype(bool))
        w1 = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
        ref, _ = ab.abmil_pool_reference(x, mask, w1, b1, w2, 0.3)
        got = ab._abmil_pool_tpu(x, mask, w1, b1, w2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        # gradients flow through the custom vjp
        g = jax.grad(lambda w: jnp.sum(ab._abmil_pool_tpu(x, mask, w, b1, w2) ** 2))(w1)
        g_ref = jax.grad(lambda w: jnp.sum(
            ab.abmil_pool_reference(x, mask, w, b1, w2, 0.3)[0] ** 2))(w1)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)
    finally:
        ab.INTERPRET = old


def test_abmil_bf16_storage_accuracy():
    """bf16-stored features stream natively through the fused ABMIL kernels.
    Default precision single-rounds w1/dz to bf16 (the hi/lo split is NOT
    free at hid-width outputs — ops/abmil._PRECISE), so kernel vs f32
    reference on the same bf16 data is bf16-level (~1e-2); with
    VLSA_TPU_ABMIL_PRECISE=1 the bottleneck recovers ~f32."""
    import vlsa_tpu.ops.abmil as ab
    old = ab.INTERPRET
    ab.INTERPRET = True
    try:
        rng = np.random.default_rng(2)
        B, N, D, H = 2, 512, 32, 16
        xb = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        x32 = xb.astype(jnp.float32)
        mask = jnp.asarray(np.concatenate(
            [np.ones((B, N - 64)), np.zeros((B, 64))], 1).astype(bool))
        w1 = jnp.asarray(rng.normal(size=(H, D)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.1)

        got = ab._abmil_pool_tpu(xb, mask, w1, b1, w2)
        ref, _ = ab.abmil_pool_reference(x32, mask, w1, b1, w2, 0.0)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 2e-2, rel

        def loss_k(w1_, x_):
            return jnp.sum(ab._abmil_pool_tpu(x_, mask, w1_, b1, w2) ** 2)

        def loss_r(w1_, x_):
            return jnp.sum(ab.abmil_pool_reference(x_, mask, w1_, b1, w2, 0.0)[0] ** 2)

        (dw1_k, dx_k) = jax.grad(loss_k, argnums=(0, 1))(w1, xb)
        (dw1_r, dx_r) = jax.grad(loss_r, argnums=(0, 1))(w1, x32)
        rel = float(jnp.max(jnp.abs(dw1_k - dw1_r)) / jnp.max(jnp.abs(dw1_r)))
        assert rel < 5e-2, rel
        rel = float(jnp.max(jnp.abs(dx_k.astype(jnp.float32) - dx_r))
                    / jnp.max(jnp.abs(dx_r)))
        assert rel < 5e-2, rel  # dX written in bf16 + single-rounded w1

        # precise mode: hi/lo splits recover ~f32 on the bottleneck
        ab._PRECISE = True
        got_p = ab._abmil_pool_tpu(xb, mask, w1, b1, w2)
        rel = float(jnp.max(jnp.abs(got_p - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 1e-3, rel
    finally:
        ab._PRECISE = os.environ.get("VLSA_TPU_ABMIL_PRECISE", "0") == "1"
        ab.INTERPRET = old


def test_coattn_nodx_kernel_grads():
    """dQ-only backward (x declared constant) matches the full kernel's dQ
    and the XLA reference; dX is exactly zero."""
    import vlsa_tpu.ops.coattn as co
    co.INTERPRET = True
    try:
        P, B, N, C = 5, 2, 512, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        mask = jnp.asarray(rng.random((B, N)) > 0.2)

        def loss_sg(q, x):
            return co.coattn_pool(q, x, mask, 30.0, use_pallas=True,
                                  x_stop_gradient=True).sum()

        def loss_ref(q, x):
            return co.coattn_pool_reference(
                q, jax.lax.stop_gradient(x), mask, 30.0).sum()

        (dq, dx) = jax.grad(loss_sg, argnums=(0, 1))(q, x)
        (dq_r, dx_r) = jax.grad(loss_ref, argnums=(0, 1))(q, x)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                                   rtol=2e-4, atol=2e-5)
        assert np.abs(np.asarray(dx)).max() == 0.0
        assert np.abs(np.asarray(dx_r)).max() == 0.0
    finally:
        co.INTERPRET = False


def test_coattn_bf16_hilo_accuracy():
    """bf16-stored features take the bf16 matmul path with hi+lo splits of
    the small M-side matrices (docs/PERF.md): kernel COMPUTE error vs an
    f32-compute reference on the same bf16-rounded data must be ~1e-4 —
    i.e. the fast path adds nothing beyond the storage rounding itself."""
    import vlsa_tpu.ops.coattn as co
    co.INTERPRET = True
    try:
        P, B, N, C = 5, 2, 512, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
        xb = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32).astype(jnp.bfloat16)
        x_as32 = xb.astype(jnp.float32)  # same storage rounding, f32 compute
        mask = jnp.asarray(rng.random((B, N)) > 0.2)
        scale = 30.0

        out_k = co._coattn_pool_tpu(q, xb, mask, jnp.float32(scale))
        out_r = co.coattn_pool_reference(q, x_as32, mask, scale)
        rel = float(jnp.max(jnp.abs(out_k - out_r)) / jnp.max(jnp.abs(out_r)))
        assert rel < 1e-3, rel

        dq_k = jax.grad(lambda q_: jnp.sum(
            co._coattn_pool_tpu(q_, xb, mask, jnp.float32(scale)) ** 2))(q)
        dq_r = jax.grad(lambda q_: jnp.sum(
            co.coattn_pool_reference(q_, x_as32, mask, scale) ** 2))(q)
        rel = float(jnp.max(jnp.abs(dq_k - dq_r)) / jnp.max(jnp.abs(dq_r)))
        assert rel < 2e-3, rel

        # full backward (dX path) stays close too
        dq_k, dx_k = jax.grad(lambda q_, x_: jnp.sum(
            co._coattn_pool_tpu(q_, x_, mask, jnp.float32(scale)) ** 2),
            argnums=(0, 1))(q, xb)
        dx_r = jax.grad(lambda x_: jnp.sum(
            co.coattn_pool_reference(q, x_, mask, scale) ** 2))(x_as32)
        s = float(jnp.max(jnp.abs(dx_r)))
        rel = float(jnp.max(jnp.abs(dx_k.astype(jnp.float32) - dx_r))) / s
        assert rel < 2e-2, rel  # dX is written in bf16 (storage dtype)
    finally:
        co.INTERPRET = False


def test_trimmed_prompt_forward_identical():
    """Trimmed prompt encoding (VLSA.text_trim_len) is numerically identical
    to the full-context forward: causal attention means positions past the
    last real token never reach the cls/eot readout, and the cls token keeps
    its full-length positional row."""
    from vlsa_tpu.models.text_encoder import make_text_tower

    tower = make_text_tower("CONCH", width=64, heads=4, layers=2,
                            context_length=128, output_dim=32)
    K, L_full = 3, tower.max_num_tokens
    rng = np.random.default_rng(0)
    real_lens = [9, 14, 11]
    embeds = np.zeros((K, L_full, 64), np.float32)
    pseudo = np.zeros((K, L_full), np.int32)
    pad_embed = rng.normal(size=(64,)).astype(np.float32)  # shared pad vector
    embeds[:] = pad_embed
    for k, sl in enumerate(real_lens):
        embeds[k, :sl] = rng.normal(size=(sl, 64))
        pseudo[k, :sl] = np.arange(sl) + 1

    params = tower.init(jax.random.PRNGKey(0),
                        prompts_embedding=jnp.asarray(embeds),
                        prompts_pseudo_tokens=jnp.asarray(pseudo))["params"]
    full = tower.apply({"params": params},
                       prompts_embedding=jnp.asarray(embeds),
                       prompts_pseudo_tokens=jnp.asarray(pseudo))
    trim = min(-(-(max(real_lens) + 1) // 8) * 8, L_full)
    trimmed = tower.apply({"params": params},
                          prompts_embedding=jnp.asarray(embeds[:, :trim]),
                          prompts_pseudo_tokens=jnp.asarray(pseudo[:, :trim]))
    np.testing.assert_allclose(np.asarray(trimmed), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_abmil_fused_backward_grads():
    """Fused streaming ABMIL backward matches XLA-reference gradients for
    every input (x, W1, b1, w2) under masking."""
    import vlsa_tpu.ops.abmil as ab
    ab.INTERPRET = True
    try:
        B, N, D, H = 2, 512, 64, 32
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, N)) > 0.25)
        w1 = jnp.asarray(rng.normal(size=(H, D)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(H,)) * 0.2, jnp.float32)

        def loss_fused(x, w1, b1, w2):
            return (ab._abmil_pool_tpu(x, mask, w1, b1, w2) ** 2).sum()

        def loss_ref(x, w1, b1, w2):
            return (ab.abmil_pool_reference(x, mask, w1, b1, w2, 0.0)[0] ** 2).sum()

        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w1, b1, w2)
        for a, b, name in zip(got, want, ("dx", "dw1", "db1", "dw2")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5, err_msg=name)
    finally:
        ab.INTERPRET = False


def test_frozen_tower_bf16_weight_storage_identical():
    """cast_frozen_tower_weights stores the resblock matmul weights in bf16;
    since the bf16-compute tower casts them with .astype(bf16) inside every
    matmul anyway, outputs must be BIT-IDENTICAL — only embeddings, LN params
    and biases stay f32."""
    from vlsa_tpu.models.text_encoder import make_text_tower
    from vlsa_tpu.models.precision import cast_frozen_tower_weights

    tower = make_text_tower("CONCH", width=64, heads=4, layers=2,
                            context_length=32, vocab_size=128, output_dim=16,
                            dtype="bfloat16")
    rng = np.random.default_rng(0)
    L = tower.max_num_tokens
    emb = jnp.asarray(rng.normal(size=(3, L, 64)), jnp.float32)
    pseudo = jnp.zeros((3, L), jnp.int32).at[:, :5].set(jnp.arange(1, 6))
    params = tower.init(jax.random.PRNGKey(0), prompts_embedding=emb,
                        prompts_pseudo_tokens=pseudo)["params"]
    out_f32store = tower.apply({"params": params}, prompts_embedding=emb,
                               prompts_pseudo_tokens=pseudo)
    cast = cast_frozen_tower_weights({"prompt_encoder": dict(params)})
    out_bf16store = tower.apply({"params": cast["prompt_encoder"]},
                                prompts_embedding=emb,
                                prompts_pseudo_tokens=pseudo)
    assert np.array_equal(np.asarray(out_f32store), np.asarray(out_bf16store))
    # embeddings and LN params kept f32
    pe = cast["prompt_encoder"]
    assert pe["token_embedding"].dtype == jnp.float32
    assert pe["resblock_0"]["attn"]["in_proj_weight"].dtype == jnp.bfloat16
    assert pe["resblock_0"]["attn"]["in_proj_bias"].dtype == jnp.float32
    assert pe["resblock_0"]["ln_1"]["scale"].dtype == jnp.float32


def test_vlsa_precomputed_text_identical():
    """model(X, text_features=tf, query=q) with (tf, q) = text_precompute()
    is bit-identical to the self-contained forward (eval-loop caching)."""
    import jax as _jax
    from __graft_entry__ import _build_flagship
    model, params = _build_flagship(small=True, dim_in=64)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 64, 64)), jnp.float32)
    mask = jnp.ones((2, 64), bool)
    out_full = model.apply({"params": params}, feats, mask)
    tf, q = model.apply({"params": params}, method=model.text_precompute)
    out_pre = model.apply({"params": params}, feats, mask,
                          text_features=tf, query=q)
    for a, b in zip(out_full, out_pre):
        assert np.array_equal(np.asarray(a), np.asarray(b))
