"""Vision-tower + caption-decoder parity vs the reference's vendored torch
implementations (shared random weights): CLIP ViT / ModifiedResNet
(ref model/clip/model.py), the CoCa AttentionalPooler and
MultimodalTransformer (ref model/conch/transformer.py), and the full
ConchVisualModel + generate pipeline (smoke — the reference's timm trunk
cannot be instantiated here, timm is stubbed)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available, add_reference_to_path
from vlsa_tpu.utils.ref_stubs import install_reference_stubs

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not reference_available(),
                                 reason="reference repo not mounted")]

RNG = np.random.default_rng(11)


def _ref_clip_module():
    add_reference_to_path()
    install_reference_stubs()
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", os.path.join(REFERENCE_ROOT, "model/clip/model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_conch_tf():
    add_reference_to_path()
    install_reference_stubs()
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "ref_conch_tf_vis", os.path.join(REFERENCE_ROOT, "model/conch/transformer.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clip_vit_parity():
    import torch
    ref_mod = _ref_clip_module()
    torch.manual_seed(0)
    ref = ref_mod.VisionTransformer(input_resolution=32, patch_size=8,
                                    width=32, layers=2, heads=4, output_dim=16)
    ref.eval()

    from vlsa_tpu.models.vision_tower import CLIPViT, import_clip_vit_state
    ours = CLIPViT(input_resolution=32, patch_size=8, width=32, layers=2,
                   heads=4, output_dim=16)
    params = import_clip_vit_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        layers=2, prefix="")
    imgs = RNG.normal(size=(3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(imgs)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_modified_resnet_parity():
    import torch
    ref_mod = _ref_clip_module()
    torch.manual_seed(1)
    ref = ref_mod.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=16, heads=4,
                                 input_resolution=32, width=16)
    ref.eval()
    # non-trivial BN running stats
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)

    from vlsa_tpu.models.vision_tower import (
        CLIPModifiedResNet, import_clip_resnet_state)
    ours = CLIPModifiedResNet(layers=(1, 1, 1, 1), output_dim=16, heads=4,
                              input_resolution=32, width=16)
    params = import_clip_resnet_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        layers=(1, 1, 1, 1), prefix="")
    imgs = RNG.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(imgs)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d_model,context_dim", [(32, 48), (32, 32)])
def test_attentional_pooler_parity(d_model, context_dim):
    """Both torch MHA layouts: separate q/k/v projections (kdim != d_model)
    and the fused in_proj (kdim == d_model)."""
    import torch
    tf = _ref_conch_tf()
    torch.manual_seed(2)
    ref = tf.AttentionalPooler(d_model=d_model, context_dim=context_dim,
                               n_head=4, n_queries=5)
    ref.eval()

    from vlsa_tpu.models.vision_tower import (
        AttentionalPooler, import_attentional_pooler_state)
    ours = AttentionalPooler(d_model, context_dim, n_head=4, n_queries=5)
    params = import_attentional_pooler_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, "")
    x = RNG.normal(size=(2, 7, context_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multimodal_decoder_parity():
    import torch
    tf = _ref_conch_tf()
    torch.manual_seed(3)
    ref = tf.MultimodalTransformer(width=32, layers=2, heads=4,
                                   context_length=16, output_dim=50)
    # NOTE: ref init_parameters() is unrunnable (refers to a nonexistent
    # self.transformer, ref transformer.py:497-513, and is never called);
    # only text_projection needs init (torch.empty otherwise)
    with torch.no_grad():
        ref.text_projection.normal_(std=32 ** -0.5)
    ref.eval()

    from vlsa_tpu.models.multimodal import (
        MultimodalDecoder, import_multimodal_state)
    ours = MultimodalDecoder(width=32, heads=4, layers=2, context_length=16,
                             output_dim=50)
    params = import_multimodal_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        layers=2, prefix="")
    text = RNG.normal(size=(2, 10, 32)).astype(np.float32)
    img = RNG.normal(size=(2, 6, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(img), torch.tensor(text)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(img),
                                jnp.asarray(text)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conch_visual_and_generate_smoke():
    """Full CoCa caption pipeline shape/behaviour smoke: visual model emits
    (contrast, caption tokens); generate produces sot-prefixed, eos-closed
    captions with pads after finish (the real timm trunk weights cannot be
    loaded here — timm is stubbed; weight-level parity is covered per
    sub-module above)."""
    from vlsa_tpu.models.multimodal import MultimodalDecoder, coca_generate
    from vlsa_tpu.models.text_encoder import make_text_tower
    from vlsa_tpu.models.vision_tower import ConchVisualModel

    vm = ConchVisualModel(embed_dim_contrast=16, embed_dim_caption=32,
                          image_size=32, patch_size=16, width=32, layers=2,
                          heads=4, n_queries_caption=8)
    imgs = jnp.asarray(RNG.normal(size=(2, 3, 32, 32)).astype(np.float32))
    vp = vm.init(jax.random.PRNGKey(0), imgs)["params"]
    pooled, cap_tokens = vm.apply({"params": vp}, imgs)
    assert pooled.shape == (2, 16)
    assert cap_tokens.shape == (2, 8, 32)

    tower = make_text_tower("CONCH", name=None, width=32, heads=4, layers=2,
                            output_dim=16, vocab_size=64, context_length=24)
    L = tower.max_num_tokens
    tp = tower.init(jax.random.PRNGKey(1),
                    prompts_embedding=jnp.zeros((1, 4, 32)),
                    prompts_pseudo_tokens=jnp.zeros((1, 4), jnp.int32))["params"]
    dec = MultimodalDecoder(width=32, heads=4, layers=2, context_length=24,
                            output_dim=64)
    dp = dec.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 32)),
                  jnp.zeros((1, 4, 32)))["params"]

    caps = coca_generate(tower, tp, dec, dp, cap_tokens, seq_len=9,
                         min_seq_len=2, generation_type="top_k", top_k=1)
    assert caps.shape == (2, 9)
    assert (caps[:, 0] == 1).all()
    # every row ends with eos (forced at seq_len at the latest)
    assert ((caps == 2).sum(1) >= 1).all()
    # pads only after eos
    for row in caps:
        eos_pos = int(np.argmax(row == 2))
        assert (row[eos_pos + 1:] == 0).all()


def test_vision_tower_bf16_weight_precast_identical():
    """cast_vision_tower_weights pre-rounds exactly the tensors the bf16
    towers cast in-graph anyway, so outputs must be BIT-IDENTICAL; poolers,
    LN params, embeddings and biases stay f32 (extraction-path counterpart
    of test_frozen_tower_bf16_weight_storage_identical)."""
    from vlsa_tpu.models.precision import cast_vision_tower_weights
    from vlsa_tpu.models.vision_tower import CLIPViT, ConchVisualModel

    # --- CONCH (timm trunk + attentional poolers) ---
    vm = ConchVisualModel(embed_dim_contrast=16, embed_dim_caption=32,
                          image_size=32, patch_size=16, width=32, layers=2,
                          heads=4, n_queries_caption=8,
                          compute_dtype="bfloat16")
    imgs = jnp.asarray(RNG.normal(size=(2, 3, 32, 32)).astype(np.float32))
    vp = vm.init(jax.random.PRNGKey(0), imgs)["params"]
    want = vm.apply({"params": vp}, imgs,
                    method=ConchVisualModel.forward_no_head)
    cast = cast_vision_tower_weights(vp)
    got = vm.apply({"params": cast}, imgs,
                   method=ConchVisualModel.forward_no_head)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    assert cast["trunk"]["patch_embed_weight"].dtype == jnp.bfloat16
    assert cast["trunk"]["block_0"]["qkv_weight"].dtype == jnp.bfloat16
    assert cast["trunk"]["block_0"]["qkv_bias"].dtype == jnp.float32
    assert cast["trunk"]["block_0"]["norm1"]["scale"].dtype == jnp.float32
    # the f32-compute attentional poolers are untouched
    chex_untouched = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()
                          and a.dtype == b.dtype),
        vp["attn_pool_contrast"], cast["attn_pool_contrast"])
    assert all(jax.tree.leaves(chex_untouched))

    # --- CLIP ViT (text-tower resblocks + f32 stem) ---
    vit = CLIPViT(input_resolution=32, patch_size=8, width=32, layers=2,
                  heads=4, output_dim=16, compute_dtype="bfloat16")
    p = vit.init(jax.random.PRNGKey(1), imgs)["params"]
    want = vit.apply({"params": p}, imgs)
    cast = cast_vision_tower_weights(p)
    got = vit.apply({"params": cast}, imgs)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    assert cast["resblock_0"]["attn"]["in_proj_weight"].dtype == jnp.bfloat16
    assert cast["conv1_weight"].dtype == jnp.float32
