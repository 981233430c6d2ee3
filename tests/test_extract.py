"""Patch->feature extraction pipeline tests.

Preprocessing parity: the transform stack (ref model/conch/transform.py:11-39,
model/clip/clip.py:79-86) is torchvision-on-PIL; PIL is the numerics oracle
(torchvision's PIL path delegates resize/crop to it), so `resize_bicubic_u8`
must match `PIL.Image.resize(..., BICUBIC)` *byte for byte* and the composed
stack must match a PIL+numpy emulation of Compose([Resize, CenterCrop,
ToTensor, Normalize]) exactly.

Pos-embed resize parity: `resize_pos_embed` vs torch
F.interpolate(mode='bilinear', align_corners=False, antialias=False) — the
timm resample_abs_pos_embed configuration the reference factory wires
(ref model/conch/coca_model.py:348-370, factory.py:27-31).
"""
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from vlsa_tpu.data.transforms import (
    OPENAI_DATASET_MEAN, OPENAI_DATASET_STD, center_crop, preprocess_tile,
    resize_bicubic_u8, resize_shortest_edge)
from vlsa_tpu.models.vision_tower import resize_pos_embed

RNG = np.random.default_rng(11)

SMALL_CONCH = dict(layers=2, width=48, heads=4, embed_dim_contrast=64,
                   embed_dim_caption=32, attn_pooler_heads=4,
                   n_queries_caption=4, patch_size=16)


def _pil_resize(img: np.ndarray, out_wh):
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize(out_wh, Image.BICUBIC))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((448, 448), (448, 448)),   # identity
    ((96, 80), (448, 448)),     # upscale
    ((600, 512), (448, 448)),   # downscale (antialiased support)
    ((300, 500), (448, 448)),   # mixed
    ((448, 448), (224, 224)),   # exact /2
    ((97, 61), (53, 41)),       # odd sizes
])
def test_resize_bicubic_matches_pil_exactly(in_hw, out_hw):
    img = RNG.integers(0, 256, size=in_hw + (3,), dtype=np.uint8)
    ours = resize_bicubic_u8(img, out_hw)
    ref = _pil_resize(img, (out_hw[1], out_hw[0]))
    assert ours.dtype == np.uint8 and ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_resize_shortest_edge_semantics():
    # torchvision Resize(int): short edge -> size, long edge int-truncated
    img = RNG.integers(0, 256, size=(500, 300, 3), dtype=np.uint8)
    out = resize_shortest_edge(img, 448)
    assert out.shape == (int(448 * 500 / 300), 448, 3)
    # no-op when the short edge already matches
    img2 = RNG.integers(0, 256, size=(600, 448, 3), dtype=np.uint8)
    assert resize_shortest_edge(img2, 448) is img2
    # parity with PIL at the torchvision-computed size
    ref = _pil_resize(img, (448, int(448 * 500 / 300)))
    np.testing.assert_array_equal(out, ref)


def test_center_crop_torchvision_semantics():
    img = RNG.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    out = center_crop(img, 4)
    # torchvision: top = int(round((10-4)/2)) = 3, left = int(round((7-4)/2)) = 2
    # (Python banker's rounding: round(1.5) == 2)
    np.testing.assert_array_equal(out, img[3:7, 2:6])
    # pad-then-crop when smaller: left/top get pad//2
    small = RNG.integers(1, 256, size=(2, 2, 3), dtype=np.uint8)
    out = center_crop(small, 4)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[1:3, 1:3], small)
    assert out[0].sum() == 0 and out[:, 0].sum() == 0


@pytest.mark.parametrize("in_hw", [(448, 448), (512, 700), (320, 240)])
def test_preprocess_tile_matches_reference_stack(in_hw):
    """Emulate Compose([Resize(448,BICUBIC), CenterCrop(448), ToTensor,
    Normalize]) with PIL + numpy (the exact reference stack) and require
    bit-identical output."""
    from PIL import Image
    img = RNG.integers(0, 256, size=in_hw + (3,), dtype=np.uint8)
    ours = preprocess_tile(img, 448)

    pim = Image.fromarray(img)
    h, w = in_hw
    if min(h, w) != 448:
        if w <= h:
            nw, nh = 448, int(448 * h / w)
        else:
            nw, nh = int(448 * w / h), 448
        pim = pim.resize((nw, nh), Image.BICUBIC)
    arr = np.asarray(pim)
    hh, ww = arr.shape[:2]
    top = int(round((hh - 448) / 2.0))
    left = int(round((ww - 448) / 2.0))
    arr = arr[top:top + 448, left:left + 448]
    ref = (arr.astype(np.float32) / 255.0
           - np.asarray(OPENAI_DATASET_MEAN, np.float32)) \
        / np.asarray(OPENAI_DATASET_STD, np.float32)
    ref = ref.transpose(2, 0, 1)
    assert ours.shape == (3, 448, 448)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# pos-embed resize
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("g_old,g_new", [(14, 28), (28, 14), (7, 9)])
def test_resize_pos_embed_matches_torch_bilinear(g_old, g_new):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    C = 32
    pe = RNG.normal(size=(1, 1 + g_old * g_old, C)).astype(np.float32)
    ours = resize_pos_embed(pe, (g_new, g_new))

    t = torch.from_numpy(pe[0, 1:].reshape(g_old, g_old, C)
                         .transpose(2, 0, 1)[None])
    ref_grid = F.interpolate(t, size=(g_new, g_new), mode="bilinear",
                             align_corners=False, antialias=False)
    ref = np.concatenate(
        [pe[:, :1],
         ref_grid[0].numpy().transpose(1, 2, 0).reshape(1, g_new * g_new, C)],
        axis=1)
    assert ours.shape == (1, 1 + g_new * g_new, C)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_resize_pos_embed_identity():
    pe = RNG.normal(size=(1, 1 + 16, 8)).astype(np.float32)
    np.testing.assert_array_equal(resize_pos_embed(pe, (4, 4)), pe)


def _random_conch_state(rng, grid, cfg=SMALL_CONCH):
    """Minimal torch-layout visual.* state dict for import tests."""
    W, L = cfg["width"], cfg["layers"]
    Dc, Dcap = cfg["embed_dim_contrast"], cfg["embed_dim_caption"]
    P = cfg["patch_size"]
    n = lambda *s: rng.normal(size=s).astype(np.float32) * 0.02
    st = {
        "visual.trunk.patch_embed.proj.weight": n(W, 3, P, P),
        "visual.trunk.patch_embed.proj.bias": n(W),
        "visual.trunk.cls_token": n(1, 1, W),
        "visual.trunk.pos_embed": n(1, 1 + grid * grid, W),
        "visual.trunk.norm.weight": n(W) + 1, "visual.trunk.norm.bias": n(W),
        "visual.ln_contrast.weight": n(Dc) + 1, "visual.ln_contrast.bias": n(Dc),
        "visual.proj_contrast": n(Dc, Dc),
        "visual.ln_caption.weight": n(Dcap) + 1, "visual.ln_caption.bias": n(Dcap),
    }
    for i in range(L):
        p = f"visual.trunk.blocks.{i}."
        st.update({
            p + "norm1.weight": n(W) + 1, p + "norm1.bias": n(W),
            p + "norm2.weight": n(W) + 1, p + "norm2.bias": n(W),
            p + "attn.qkv.weight": n(3 * W, W), p + "attn.qkv.bias": n(3 * W),
            p + "attn.proj.weight": n(W, W), p + "attn.proj.bias": n(W),
            p + "mlp.fc1.weight": n(4 * W, W), p + "mlp.fc1.bias": n(4 * W),
            p + "mlp.fc2.weight": n(W, 4 * W), p + "mlp.fc2.bias": n(W),
        })
    for pool, d in (("attn_pool_contrast", Dc), ("attn_pool_caption", Dcap)):
        p = f"visual.{pool}."
        st.update({
            p + "query": n(cfg["n_queries_caption"] if "caption" in pool else 1, d),
            p + "ln_q.weight": n(d) + 1, p + "ln_q.bias": n(d),
            p + "ln_k.weight": n(W) + 1, p + "ln_k.bias": n(W),
            p + "attn.q_proj_weight": n(d, d),
            p + "attn.k_proj_weight": n(d, W),
            p + "attn.v_proj_weight": n(d, W),
            p + "attn.in_proj_bias": n(3 * d),
            p + "attn.out_proj.weight": n(d, d), p + "attn.out_proj.bias": n(d),
        })
    return st


def test_importer_resizes_pos_embed_to_model_grid():
    """A 64-trained checkpoint (grid 4) imports into a 96-input model
    (grid 6) — the reference's 224->448 situation scaled down (ref
    model/conch/factory.py:27-31)."""
    from vlsa_tpu.models.vision_tower import import_conch_visual_state
    st = _random_conch_state(np.random.default_rng(0), grid=4)
    params = import_conch_visual_state(st, layers=SMALL_CONCH["layers"],
                                       image_size=96, patch_size=16)
    assert params["trunk"]["pos_embed"].shape == (1, 1 + 36, SMALL_CONCH["width"])
    # prefix token untouched
    np.testing.assert_array_equal(
        params["trunk"]["pos_embed"][:, 0],
        st["visual.trunk.pos_embed"][:, 0])


# ---------------------------------------------------------------------------
# Extractor end-to-end
# ---------------------------------------------------------------------------


def test_extractor_batching_invariance(tmp_path):
    """Padded ragged tail == one big batch; conch path, small config."""
    from vlsa_tpu.data.extract import FeatureExtractor
    tiles = RNG.integers(0, 256, size=(5, 32, 32, 3), dtype=np.uint8)
    kw = dict(model_name="conch", image_size=32, compute_dtype="float32",
              model_overrides=SMALL_CONCH)
    small = FeatureExtractor(batch_size=2, **kw)
    big = FeatureExtractor(batch_size=8, **kw)
    f1, f2 = small.extract(tiles), big.extract(tiles)
    assert f1.shape == (5, SMALL_CONCH["embed_dim_contrast"])
    np.testing.assert_allclose(f1, f2, atol=1e-5, rtol=1e-5)
    assert np.isfinite(f1).all()


def test_extractor_checkpoint_import_parity(tmp_path):
    """Random torch-layout checkpoint -> extractor == direct model apply."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from vlsa_tpu.data.extract import FeatureExtractor
    from vlsa_tpu.models.vision_tower import (
        ConchVisualModel, import_conch_visual_state)
    st = _random_conch_state(np.random.default_rng(1), grid=2)
    ckpt = tmp_path / "conch.bin"
    torch.save({k: torch.from_numpy(v) for k, v in st.items()}, str(ckpt))

    ex = FeatureExtractor(model_name="conch", checkpoint=str(ckpt),
                          image_size=32, batch_size=4,
                          compute_dtype="float32",
                          model_overrides=SMALL_CONCH)
    tiles = RNG.integers(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    feats = ex.extract(tiles)

    model = ConchVisualModel(image_size=32, compute_dtype="float32",
                             **SMALL_CONCH)
    params = import_conch_visual_state(st, layers=SMALL_CONCH["layers"],
                                       image_size=32, patch_size=16)
    x = ex.preprocess(tiles)
    ref = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.asarray(x), method=ConchVisualModel.forward_no_head)
    np.testing.assert_allclose(feats, np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_store_roundtrip_and_coords(tmp_path):
    from vlsa_tpu.data.extract import write_feature_store
    from vlsa_tpu.data.io import read_patch_coord, read_patch_data
    feats = RNG.normal(size=(17, 64)).astype(np.float32)
    coords = RNG.integers(0, 10000, size=(17, 2))
    p_npy = write_feature_store(str(tmp_path / "f"), "s1", feats, "npy",
                                coords=coords,
                                coord_dir=str(tmp_path / "c"))
    np.testing.assert_array_equal(read_patch_data(p_npy), feats)
    np.testing.assert_array_equal(
        read_patch_coord(str(tmp_path / "c" / "s1.h5")), coords)
    p_q8 = write_feature_store(str(tmp_path / "f"), "s1", feats, "q8npz")
    deq = read_patch_data(p_q8)
    # per-patch symmetric int8: worst-case error = scale/2 = absmax/254
    bound = np.abs(feats).max(axis=-1, keepdims=True) / 254 + 1e-7
    assert (np.abs(deq - feats) <= bound).all()


def test_tile_source_listing_and_h5(tmp_path):
    import h5py
    from vlsa_tpu.data.extract import list_tile_sources, read_tiles
    tiles = RNG.integers(0, 256, size=(4, 16, 16, 3), dtype=np.uint8)
    coords = RNG.integers(0, 999, size=(4, 2))
    with h5py.File(tmp_path / "slideA.h5", "w") as hf:
        hf.create_dataset("imgs", data=tiles)
        hf.create_dataset("coords", data=coords)
    np.save(tmp_path / "slideB.npy", tiles)
    srcs = dict(list_tile_sources(str(tmp_path)))
    assert set(srcs) == {"slideA", "slideB"}
    ta, ca = read_tiles(srcs["slideA"])
    np.testing.assert_array_equal(ta, tiles)
    np.testing.assert_array_equal(ca, coords)
    tb, cb = read_tiles(srcs["slideB"])
    np.testing.assert_array_equal(tb, tiles)
    assert cb is None


def test_image_dir_source_with_coords(tmp_path):
    from PIL import Image
    from vlsa_tpu.data.extract import read_tiles
    d = tmp_path / "slideC"
    d.mkdir()
    tiles = RNG.integers(0, 256, size=(3, 16, 16, 3), dtype=np.uint8)
    for i, (x, y) in enumerate([(0, 0), (448, 0), (0, 448)]):
        Image.fromarray(tiles[i]).save(d / f"tile_{x}_{y}.png")
    got, coords = read_tiles(str(d))
    assert got.shape == (3, 16, 16, 3)
    # sorted filename order: tile_0_0, tile_0_448, tile_448_0
    np.testing.assert_array_equal(coords, [[0, 0], [0, 448], [448, 0]])


@pytest.mark.slow
def test_extract_then_train_e2e(tmp_path):
    """Synthetic tiles -> extract (small conch) -> .npy store + coords ->
    SA training run on the store through the production handler."""
    import h5py
    from test_runner_e2e import base_cfg, make_cohort
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store
    from vlsa_tpu.runner import SAHandler

    table, split = make_cohort(tmp_path, n_patients=12, seed=5)
    import pandas as pd
    sids = pd.read_csv(table)["pathology_id"].tolist()
    tile_dir = tmp_path / "tiles"
    tile_dir.mkdir()
    rng = np.random.default_rng(0)
    for sid in sids:
        tiles = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
        coords = rng.integers(0, 4480, size=(6, 2))
        with h5py.File(tile_dir / f"{sid}.h5", "w") as hf:
            hf.create_dataset("imgs", data=tiles)
            hf.create_dataset("coords", data=coords)

    ex = FeatureExtractor(model_name="conch", image_size=32, batch_size=4,
                          compute_dtype="float32", model_overrides=SMALL_CONCH)
    stats = extract_to_store(str(tile_dir), str(tmp_path / "feats"), ex,
                             fmt="npy", coord_dir=str(tmp_path / "coords"))
    assert stats["slides"] == len(sids) and stats["tiles"] == 6 * len(sids)

    cfg = base_cfg(tmp_path, table, split)
    cfg.update(path_patch=str(tmp_path / "feats"), feat_format="npy",
               path_coord=str(tmp_path / "coords"), min_bucket=8,
               epochs=1, bp_every_batch=4)
    h = SAHandler(cfg)
    metrics = h.exec()
    assert osp.exists(osp.join(cfg["save_path"], "train_metrics-last.txt"))
    assert "test" in metrics and np.isfinite(dict(metrics["test"])["pred_c_index"])


@pytest.mark.slow
def test_extract_cli_synthetic(tmp_path):
    """The CLI driver runs end-to-end in synthetic mode (full-size tower at
    a small image size) and reports tiles/sec."""
    import json
    out = tmp_path / "feats"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               VLSA_TPU_COMPILE_CACHE=os.environ.get(
                   "VLSA_TPU_TEST_CACHE", "/root/.cache/jax_test_comp_cache"))
    r = subprocess.run(
        [sys.executable, "scripts/extract_features.py", "--synthetic", "1",
         "--synthetic_tiles", "6", "--image_size", "64", "--batch", "4",
         "--dtype", "float32", "--out", str(out)],
        capture_output=True, text=True, env=env,
        cwd=osp.dirname(osp.dirname(osp.abspath(__file__))), timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["slides"] == 1 and stats["tiles"] == 6
    files = os.listdir(out)
    assert any(f.endswith(".npy") for f in files)


def test_bf16_residual_stream_close_to_f32():
    """The opt-in bf16-residual trunk stays
    close to the f32-residual reference path: the stream itself rounds to
    bf16 between ops, but LN statistics and matmul accumulation remain f32,
    so the 512-d features deviate only at bf16 rounding scale."""
    import jax
    import jax.numpy as jnp
    from vlsa_tpu.models.vision_tower import ConchVisualModel

    imgs = jnp.asarray(RNG.normal(size=(2, 3, 32, 32)).astype(np.float32))
    base = ConchVisualModel(image_size=32, compute_dtype="float32",
                            **SMALL_CONCH)
    p = base.init(jax.random.PRNGKey(0), imgs)["params"]
    want = np.asarray(base.apply(
        {"params": p}, imgs, method=ConchVisualModel.forward_no_head))
    lowp = ConchVisualModel(image_size=32, compute_dtype="bfloat16",
                            trunk_residual_dtype="bfloat16", **SMALL_CONCH)
    got = np.asarray(lowp.apply(
        {"params": p}, imgs, method=ConchVisualModel.forward_no_head))
    scale = float(np.abs(want).max())
    assert float(np.abs(got - want).max()) <= 2e-2 * scale


def test_extractor_residual_dtype_plumbing():
    """The default extractor keeps the exact f32 residual stream (a bf16
    stream measured perf-NEUTRAL on-chip, EXTRACT_CHIP.json); the explicit
    `residual_dtype="bfloat16"` opt-in must produce the same feature shape
    and only bf16-rounding-scale deviations."""
    from vlsa_tpu.data.extract import FeatureExtractor

    kw = dict(model_name="conch", image_size=32, batch_size=2,
              model_overrides=dict(SMALL_CONCH))
    tiles = RNG.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    default_ex = FeatureExtractor(compute_dtype="float32", **kw)
    a = default_ex.extract(tiles)
    lowp_ex = FeatureExtractor(compute_dtype="float32",
                               residual_dtype="bfloat16", **kw)
    b = lowp_ex.extract(tiles)
    assert a.shape == b.shape == (3, SMALL_CONCH["embed_dim_contrast"])
    scale = float(np.abs(a).max())
    dev = float(np.abs(a - b).max())
    assert 0 < dev <= 2e-2 * scale  # different stream, close output


def test_extractor_multi_device_matches_single():
    """Sharded extraction (batch axis over a 1-D data mesh, params
    replicated) must reproduce the single-device features — including the
    zero-padded ragged tail batch — and reject a batch size the mesh
    cannot split evenly."""
    import jax
    from vlsa_tpu.data.extract import FeatureExtractor

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    kw = dict(model_name="conch", image_size=32, batch_size=4,
              compute_dtype="float32", model_overrides=dict(SMALL_CONCH))
    tiles = RNG.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    a = FeatureExtractor(**kw).extract(tiles)
    b = FeatureExtractor(num_devices=4, **kw).extract(tiles)
    assert a.shape == b.shape == (10, SMALL_CONCH["embed_dim_contrast"])
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        FeatureExtractor(num_devices=3, **kw)

    # the fused u8 pipeline (device preprocessing) must shard identically:
    # raw 48x40 tiles, batch axis over the mesh, same features as the
    # single-device host-preprocess path
    tiles_raw = RNG.integers(0, 255, (10, 48, 40, 3), dtype=np.uint8)
    c = FeatureExtractor(**kw).extract(tiles_raw)
    d = FeatureExtractor(num_devices=4, device_preprocess=True,
                         **kw).extract(tiles_raw)
    assert c.shape == d.shape == (10, SMALL_CONCH["embed_dim_contrast"])
    np.testing.assert_allclose(c, d, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw", [(448, 448), (512, 512), (600, 512),
                                   (300, 500), (97, 61)])
def test_device_preprocess_byte_exact_vs_host(in_hw):
    """The on-device transform stack's exactness contract vs the host
    numpy path: the integer pipeline (tap-form PIL fixed-point resize +
    static crop) is BYTE-exact on every backend (elementwise int32 ops —
    a dense int32 matmul is NOT exact on TPU), and the final f32 normalize
    matches to <= 1 ulp.  scripts/validate_extraction_chip.py asserts the
    same contract on the real chip."""
    import jax.numpy as jnp
    from vlsa_tpu.data.transforms import center_crop, resize_shortest_edge
    from vlsa_tpu.data.transforms_device import build_device_preprocess

    S = 96
    tiles = RNG.integers(0, 256, size=(3,) + in_hw + (3,), dtype=np.uint8)
    fn_u8 = build_device_preprocess(in_hw, S, normalize=False)
    got_u8 = np.asarray(fn_u8(jnp.asarray(tiles)))
    want_u8 = np.stack(
        [center_crop(resize_shortest_edge(t, S), S) for t in tiles])
    assert got_u8.shape == want_u8.shape == (3, S, S, 3)
    np.testing.assert_array_equal(got_u8, want_u8)

    fn = build_device_preprocess(in_hw, S)
    got = np.asarray(fn(jnp.asarray(tiles)))
    want = np.stack([preprocess_tile(t, S) for t in tiles])
    assert got.shape == want.shape == (3, 3, S, S)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_extractor_device_preprocess_matches_host():
    """FeatureExtractor(device_preprocess=True) must reproduce the host-
    preprocessed features (f32 tower; integer preprocessing byte-exact,
    normalize within 1 ulp) including the zero-padded ragged tail, and
    'auto' must resolve to the host path on the CPU backend."""
    from vlsa_tpu.data.extract import FeatureExtractor

    kw = dict(model_name="conch", image_size=32, batch_size=4,
              compute_dtype="float32", model_overrides=dict(SMALL_CONCH))
    tiles = RNG.integers(0, 255, (6, 48, 40, 3), dtype=np.uint8)  # resized
    host_ex = FeatureExtractor(device_preprocess=False, **kw)
    dev_ex = FeatureExtractor(device_preprocess=True, **kw)
    a = host_ex.extract(tiles)
    b = dev_ex.extract(tiles)
    assert a.shape == b.shape == (6, SMALL_CONCH["embed_dim_contrast"])
    # preprocessing is byte-exact; the residual 1e-6-scale deviation is
    # f32 fusion-order noise between the two compiled programs
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    auto_ex = FeatureExtractor(device_preprocess="auto", **kw)
    assert auto_ex._device_preprocess is False  # CPU backend -> host path


def test_extract_resume_and_prefetch(tmp_path):
    """`resume=True` skips slides whose store exists; the prefetch
    (read-ahead thread) path produces identical stores to the serial
    path."""
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store

    src = tmp_path / "tiles"
    src.mkdir()
    for i in range(3):
        np.save(src / f"slide_{i}.npy",
                RNG.integers(0, 255, (5, 32, 32, 3), dtype=np.uint8))
    ex = FeatureExtractor(model_name="conch", image_size=32, batch_size=4,
                          compute_dtype="float32",
                          model_overrides=dict(SMALL_CONCH))

    out_a = tmp_path / "feats_a"
    stats = extract_to_store(str(src), str(out_a), ex, verbose=False)
    assert stats["slides"] == 3 and stats["skipped"] == 0

    out_b = tmp_path / "feats_b"
    stats_b = extract_to_store(str(src), str(out_b), ex, verbose=False,
                               prefetch=False)
    assert stats_b["slides"] == 3
    for i in range(3):
        np.testing.assert_array_equal(np.load(out_a / f"slide_{i}.npy"),
                                      np.load(out_b / f"slide_{i}.npy"))

    # resume: drop one store, rerun — only the missing slide re-extracts
    (out_a / "slide_1.npy").unlink()
    stats_r = extract_to_store(str(src), str(out_a), ex, verbose=False,
                               resume=True)
    assert stats_r["skipped"] == 2 and stats_r["slides"] == 1
    np.testing.assert_array_equal(np.load(out_a / "slide_1.npy"),
                                  np.load(out_b / "slide_1.npy"))


@pytest.mark.slow
def test_extract_cli_multi_device(tmp_path):
    """--num_devices through the CLI on a virtual 4-device CPU mesh must
    reproduce the single-device extraction bit-for-bit (f32 tower,
    device_preprocess forced so the fused u8 pipeline shards too)."""
    import json
    tiles = RNG.integers(0, 255, (2, 10, 48, 40, 3), dtype=np.uint8)
    src = tmp_path / "tiles"
    src.mkdir()
    for i in range(2):
        np.save(src / f"s{i}.npy", tiles[i])
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               VLSA_TPU_COMPILE_CACHE=os.environ.get(
                   "VLSA_TPU_TEST_CACHE", "/root/.cache/jax_test_comp_cache"))
    outs = {}
    for tag, extra in (("one", []), ("four", ["--num_devices", "4"])):
        out = tmp_path / f"feats_{tag}"
        r = subprocess.run(
            [sys.executable, "scripts/extract_features.py",
             "--source", str(src), "--out", str(out),
             "--image_size", "64", "--batch", "4", "--dtype", "float32",
             "--device_preprocess", "1"] + extra,
            capture_output=True, text=True, env=env,
            cwd=osp.dirname(osp.dirname(osp.abspath(__file__))), timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["slides"] == 2 and stats["tiles"] == 20
        outs[tag] = out
    for i in range(2):
        a = np.load(outs["one"] / f"s{i}.npy")
        b = np.load(outs["four"] / f"s{i}.npy")
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# round-3 review regressions: atomic stores, empty slides, format detection,
# CLIP pos-embed resize
# ---------------------------------------------------------------------------


def test_write_store_atomic(tmp_path, monkeypatch):
    """resume relies on 'a store file only exists once fully written' —
    the write must be temp+rename, and an interrupted write must leave
    neither a truncated store nor a stray temp file."""
    from vlsa_tpu.data.extract import write_feature_store
    feats = RNG.normal(size=(4, 8)).astype(np.float32)
    p = write_feature_store(str(tmp_path), "s1", feats, "npy",
                            coords=np.zeros((4, 2), np.int64))
    assert osp.exists(p) and osp.exists(tmp_path / "s1.h5")
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

    def boom(*a, **k):
        raise KeyboardInterrupt

    monkeypatch.setattr(np, "save", boom)
    import pytest as _pytest
    with _pytest.raises(KeyboardInterrupt):
        write_feature_store(str(tmp_path), "s2", feats, "npy")
    assert not osp.exists(tmp_path / "s2.npy")
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_extract_to_store_skips_empty_slide(tmp_path):
    """A 0-tile slide must be skipped loudly (an empty store would later
    surface as an empty training bag), not crash the cohort job."""
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store
    src = tmp_path / "src"
    src.mkdir()
    np.save(src / "empty.npy", np.zeros((0, 70, 70, 3), np.uint8))
    np.save(src / "ok.npy",
            RNG.integers(0, 256, (5, 70, 70, 3)).astype(np.uint8))
    fx = FeatureExtractor(model_name="conch", image_size=64, batch_size=4,
                          compute_dtype="float32",
                          model_overrides=dict(SMALL_CONCH))
    stats = extract_to_store(str(src), str(tmp_path / "out"), fx)
    assert stats["empty"] == 1 and stats["tiles"] == 5
    assert not osp.exists(tmp_path / "out" / "empty.npy")
    assert osp.exists(tmp_path / "out" / "ok.npy")


def test_detect_feat_format_prefers_store_over_coords_sidecar(tmp_path):
    """extraction writes coords .h5 sidecars next to .npy/.q8npz stores;
    reproduce_blca's auto-detection must pick the feature format."""
    import importlib.util
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "repro_mod", osp.join(root, "scripts", "reproduce_blca.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    (tmp_path / "a.h5").write_bytes(b"x")
    (tmp_path / "a.npy").write_bytes(b"x")
    assert mod._detect_feat_format(str(tmp_path)) == "npy"
    d2 = tmp_path / "only_h5"
    d2.mkdir()
    (d2 / "a.h5").write_bytes(b"x")
    assert mod._detect_feat_format(str(d2)) == "h5"


def test_clip_importer_resizes_pos_embed():
    """A 224-grid CLIP checkpoint must load into a larger-input extractor
    (timm-semantics interpolation, same helper as the CONCH importer)."""
    from vlsa_tpu.models.vision_tower import import_clip_vit_state
    D, P = 16, 8
    ones = np.ones(D, np.float32)
    st = {
        "conv1.weight": RNG.normal(size=(D, 3, P, P)).astype(np.float32),
        "class_embedding": RNG.normal(size=(D,)).astype(np.float32),
        "positional_embedding":
            RNG.normal(size=(17, D)).astype(np.float32),   # grid 4 (32 px)
        "ln_pre.weight": ones, "ln_pre.bias": ones,
        "ln_post.weight": ones, "ln_post.bias": ones,
        "proj": RNG.normal(size=(D, 8)).astype(np.float32),
    }
    out = import_clip_vit_state(st, layers=0, prefix="",
                                image_size=48, patch_size=P)
    assert out["positional_embedding"].shape == (37, D)   # grid 6 + cls
    # matching grid: verbatim
    same = import_clip_vit_state(st, layers=0, prefix="",
                                 image_size=32, patch_size=P)
    np.testing.assert_array_equal(same["positional_embedding"],
                                  st["positional_embedding"])
