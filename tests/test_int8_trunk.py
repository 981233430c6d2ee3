"""w8a8 int8 extraction-trunk tests (opt-in `trunk_quant` lane).

The quantized path replaces the CONCH ViT trunk's four per-block linears
(qkv/proj/fc1/fc2 — ~85% of the extraction FLOPs) with s8 x s8 -> s32 dots:
per-output-channel static weight scales (`precision.quantize_rows`) and
per-token dynamic activation scales fit in-graph.  These tests pin down

  * the quantizer's error bound (half-step of the per-row int8 grid),
  * that the s8 dot accumulates EXACTLY in int32 on this backend (the
    analogous int32 dot is NOT exact on TPU — see transforms_device.py —
    so this guard must also run on-chip: validate_extraction_chip.py),
  * end-to-end closeness of the quantized tower to its float twin on
    random weights, and
  * the FeatureExtractor plumbing (flag, param-tree quantization, store
    writing through extract_to_store).

Accuracy on the real released CONCH weights is NOT covered here (artifacts
not mounted) — which is why the lane is opt-in.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlsa_tpu.models.precision import (
    cast_vision_tower_weights, quantize_rows, quantize_vision_tower_weights)
from vlsa_tpu.models.vision_tower import ConchVisualModel, _int8_dynamic_linear

RNG = np.random.default_rng(23)

SMALL_CONCH = dict(layers=2, width=48, heads=4, embed_dim_contrast=64,
                   embed_dim_caption=32, attn_pooler_heads=4,
                   n_queries_caption=4, patch_size=16)


def test_quantize_rows_error_bound():
    w = RNG.normal(size=(16, 64)).astype(np.float32) * \
        RNG.uniform(0.1, 10.0, size=(16, 1)).astype(np.float32)
    q, s = quantize_rows(w)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    # symmetric grid: |w - deq| <= scale/2 = max|row| / 254 per row
    bound = np.abs(np.asarray(w)).max(axis=1, keepdims=True) / 254.0
    assert (np.abs(deq - np.asarray(w)) <= bound + 1e-7).all()


def test_int8_dot_exact_int32_accumulation():
    # fc2-shaped worst case: K=3072 reduction, products up to 127^2 —
    # accumulator reaches ~5e7, past f32's 2^24 exact range.  The s8 dot
    # must still match numpy's int64 result bit-for-bit.
    # same-sign operands so products accumulate without cancellation
    x = RNG.integers(64, 128, size=(64, 3072), dtype=np.int8)
    w = RNG.integers(64, 128, size=(48, 3072), dtype=np.int8)
    got = jax.lax.dot_general(jnp.asarray(x), jnp.asarray(w),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    want = x.astype(np.int64) @ w.astype(np.int64).T
    assert int(np.abs(want).max()) > 2 ** 24  # the case actually stresses it
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


def test_int8_dynamic_linear_close_to_f32():
    h = jnp.asarray(RNG.normal(size=(2, 37, 64)).astype(np.float32) * 3.0)
    w = RNG.normal(size=(48, 64)).astype(np.float32)
    q, s = quantize_rows(w)
    got = _int8_dynamic_linear(h, q, s)
    want = h @ w.T
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
    assert rel < 0.02, rel


def _float_params(seed=0, image_size=64):
    model = ConchVisualModel(image_size=image_size, **SMALL_CONCH)
    dummy = jnp.zeros((1, 3, image_size, image_size), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def test_quantized_tower_close_to_float_twin():
    image_size = 64
    params = _float_params(image_size=image_size)
    qparams = quantize_vision_tower_weights(params)
    # the pre-cast must leave int8 leaves and 1-D scales alone
    qparams = cast_vision_tower_weights(qparams)
    for i in range(SMALL_CONCH["layers"]):
        blk = qparams["trunk"][f"block_{i}"]
        assert blk["qkv_weight"].dtype == jnp.int8
        assert blk["fc2_weight_scale"].dtype == jnp.float32
    x = jnp.asarray(RNG.normal(size=(3, 3, image_size, image_size))
                    .astype(np.float32))
    fm = ConchVisualModel(image_size=image_size, **SMALL_CONCH)
    qm = ConchVisualModel(image_size=image_size, trunk_quantized=True,
                          **SMALL_CONCH)
    ref = np.asarray(fm.apply({"params": params}, x,
                              method=ConchVisualModel.forward_no_head))
    got = np.asarray(qm.apply({"params": qparams}, x,
                              method=ConchVisualModel.forward_no_head))
    assert got.shape == ref.shape
    cos = (got * ref).sum(-1) / (np.linalg.norm(got, axis=-1)
                                 * np.linalg.norm(ref, axis=-1))
    assert cos.min() > 0.995, cos
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.1, rel


def test_quantize_rejects_non_conch_tree():
    with pytest.raises(ValueError):
        quantize_vision_tower_weights({"resblock_0": {}})


def test_extractor_trunk_quant_plumbing(tmp_path):
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store

    kw = dict(model_name="conch", image_size=64, batch_size=4, seed=0,
              compute_dtype="float32", model_overrides=dict(SMALL_CONCH))
    fx = FeatureExtractor(**kw)
    qx = FeatureExtractor(trunk_quant=True, **kw)
    tiles = RNG.integers(0, 256, size=(5, 70, 70, 3), dtype=np.uint8)
    f = fx.extract(tiles)
    g = qx.extract(tiles)
    assert g.shape == f.shape == (5, SMALL_CONCH["embed_dim_contrast"])
    cos = (f * g).sum(-1) / (np.linalg.norm(f, axis=-1)
                             * np.linalg.norm(g, axis=-1))
    assert cos.min() > 0.99, cos
    # clip tower has no quantized trunk
    with pytest.raises(ValueError):
        FeatureExtractor(model_name="clip_vit", trunk_quant=True,
                         image_size=64, batch_size=2)


def test_trunk_quant_multi_device_matches_single():
    """int8 params (weights + scales) must replicate over the extraction
    data mesh exactly like float params — sharded quantized extraction
    reproduces the single-device features bit-for-bit."""
    import jax
    from vlsa_tpu.data.extract import FeatureExtractor

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    kw = dict(model_name="conch", image_size=32, batch_size=4, seed=0,
              compute_dtype="float32", trunk_quant=True,
              model_overrides=dict(SMALL_CONCH))
    tiles = RNG.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    a = FeatureExtractor(**kw).extract(tiles)
    b = FeatureExtractor(num_devices=4, **kw).extract(tiles)
    assert a.shape == b.shape == (10, SMALL_CONCH["embed_dim_contrast"])
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
