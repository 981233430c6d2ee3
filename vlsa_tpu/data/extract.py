"""Patch -> feature extraction: the TPU-native path from WSI tiles to the
feature stores the survival pipeline consumes.

The reference's end-to-end story (ref README.md:88-94) tiles each WSI into
448x448 patches at 20x and runs the CONCH image encoder over them; VLSA then
trains on the resulting 512-d per-patch features.  The reference repo itself
ships no extraction driver (it points at CLAM/CONCH) — this module supplies
one, TPU-first:

  * preprocessing is the reference-exact transform stack in pure numpy
    (`transforms.py`; PIL-bit-exact bicubic, OpenAI constants),
  * the tower is the Flax `ConchVisualModel.forward_no_head` — the CONCH
    convention for MIL features (ref model/conch/coca_model.py:218-222 with
    proj_contrast=False: 512-d ln'd, unprojected) — jitted at a fixed batch
    so one compiled program serves every slide,
  * host preprocessing overlaps device compute via JAX async dispatch
    (the next batch is preprocessed while the previous one runs),
  * outputs are `.npy` (f32) or pre-quantized `.q8npz` stores plus a
    CLAM-style `coords` .h5 per slide — exactly what `data/io.py` /
    `data/pipeline.py` read.

Tile sources per slide: a CLAM-style `.h5` (datasets `imgs` [N,H,W,3] u8 +
`coords` [N,2]), a `.npy` u8 stack, or a directory of image files with
optional `<x>_<y>` coordinates in the filename.
"""
from __future__ import annotations

import os
import os.path as osp
import re
import time
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .transforms import preprocess_batch, OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")


# ---------------------------------------------------------------------------
# Tile sources
# ---------------------------------------------------------------------------


def list_tile_sources(path: str) -> List[Tuple[str, str]]:
    """Enumerate (slide_id, source_path) under `path`.

    `path` may be one slide source (.h5/.npy/dir of images) or a directory
    of such sources (one per slide)."""
    if osp.isfile(path):
        sid = osp.splitext(osp.basename(path))[0]
        return [(sid, path)]
    entries = sorted(os.listdir(path))
    img_files = [e for e in entries if e.lower().endswith(_IMG_EXTS)]
    if img_files:  # a single slide given as a directory of tiles
        return [(osp.basename(osp.normpath(path)), path)]
    out = []
    for e in entries:
        full = osp.join(path, e)
        if e.lower().endswith((".h5", ".hdf5", ".npy")):
            out.append((osp.splitext(e)[0], full))
        elif osp.isdir(full):
            out.append((e, full))
    return out


_COORD_RE = re.compile(r"(\d+)[_x,-](\d+)\D*$")


def read_tiles(source: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read one slide's tiles -> (u8 [N, H, W, 3], coords [N, 2] or None)."""
    if source.lower().endswith((".h5", ".hdf5")):
        import h5py
        with h5py.File(source, "r") as hf:
            key = "imgs" if "imgs" in hf else "tiles"
            tiles = np.asarray(hf[key][:])
            coords = np.asarray(hf["coords"][:]) if "coords" in hf else None
        return _as_u8_rgb(tiles), coords
    if source.lower().endswith(".npy"):
        return _as_u8_rgb(np.load(source)), None
    # directory of images
    files = sorted(f for f in os.listdir(source)
                   if f.lower().endswith(_IMG_EXTS))
    if not files:
        raise FileNotFoundError(f"no tiles under {source}")
    # decode in parallel: PIL releases the GIL during JPEG/PNG decode, so
    # a thread pool scales with cores on a real extraction host
    from concurrent.futures import ThreadPoolExecutor
    workers = min(8, os.cpu_count() or 1)
    if workers > 1 and len(files) > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            tiles = list(pool.map(
                lambda f: _read_image(osp.join(source, f)), files))
    else:
        tiles = [_read_image(osp.join(source, f)) for f in files]
    coords, have_coords = [], True
    for f in files:
        m = _COORD_RE.search(osp.splitext(f)[0])
        if m:
            coords.append((int(m.group(1)), int(m.group(2))))
        else:
            have_coords = False
    arr = np.stack(tiles) if len({t.shape for t in tiles}) == 1 else tiles
    return arr, (np.asarray(coords, np.int64) if have_coords else None)


def _read_image(path: str) -> np.ndarray:
    try:
        from PIL import Image
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))
    except ImportError:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return img[:, :, ::-1].copy()  # BGR -> RGB


def _as_u8_rgb(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr)
    if arr.ndim == 3:  # [H, W, 3] single tile
        arr = arr[None]
    assert arr.ndim == 4 and arr.shape[-1] == 3, f"bad tile stack {arr.shape}"
    return arr.astype(np.uint8) if arr.dtype != np.uint8 else arr


# ---------------------------------------------------------------------------
# The extractor
# ---------------------------------------------------------------------------


class FeatureExtractor:
    """Jitted fixed-batch vision-tower forward for feature extraction.

    One compiled program (batch `batch_size`, image `image_size`) serves all
    slides; ragged tails are zero-padded and sliced off.  `model_name`:
      * 'conch'    — ConchVisualModel.forward_no_head, 512-d (the reference's
                     feature convention)
      * 'clip_vit' — OpenAI CLIP ViT-B/16 image embedding, 512-d

    `device_preprocess`: 'auto' (default) runs the full transform stack
    ON DEVICE when the backend is TPU — the PIL fixed-point resize as
    per-tap int32 multiply-adds fused into the tower's jitted program
    (`transforms_device.py`: integer pipeline byte-exact vs the host
    path, normalize within 1 ulp), 4x less host->device traffic — and on
    the host otherwise.  True/False force either path.  Tiles of mixed
    shapes fall back to host preprocessing.
    """

    def __init__(self, model_name: str = "conch",
                 checkpoint: Optional[str] = None,
                 image_size: int = 448,
                 batch_size: int = 64,
                 compute_dtype: str = "bfloat16",
                 residual_dtype: Optional[str] = None,
                 num_devices: Optional[int] = None,
                 device_preprocess: "bool | str" = "auto",
                 seed: int = 0,
                 trunk_quant: bool = False,
                 model_overrides: Optional[dict] = None):
        import jax
        import jax.numpy as jnp
        from ..models.vision_tower import (
            CLIPViT, ConchVisualModel, import_clip_vit_state,
            import_conch_visual_state)

        self.model_name = model_name
        self.image_size = int(image_size)
        self.batch_size = int(batch_size)
        dummy = jnp.zeros((1, 3, self.image_size, self.image_size), jnp.float32)
        overrides = dict(model_overrides or {})
        if model_name == "conch":
            # Residual stream dtype: f32 default.  A bf16 stream was measured
            # on-chip as perf-NEUTRAL (0.998x, EXTRACT_CHIP.json
            # `residual_bf16` — the trunk is compute/op-bound, not
            # activation-HBM-bound), so the default keeps the exact-residual
            # numerics; `residual_dtype="bfloat16"` stays available.
            if residual_dtype is not None:
                overrides.setdefault("trunk_residual_dtype", residual_dtype)
            if trunk_quant:
                # w8a8 trunk linears (opt-in): int8 weights quantized below,
                # per-token dynamic activation scales in-graph.  2x MXU
                # MACs/cycle on TPU; a semantics change vs the float tower —
                # validated on random weights (tests/test_int8_trunk.py),
                # real-weight validation pending artifacts.
                overrides.setdefault("trunk_quantized", True)
            model = ConchVisualModel(image_size=self.image_size,
                                     compute_dtype=compute_dtype, **overrides)
            apply_kwargs = {"method": ConchVisualModel.forward_no_head}
        elif model_name == "clip_vit":
            if trunk_quant:
                raise ValueError("trunk_quant is only supported for the "
                                 "CONCH trunk (model_name='conch')")
            model = CLIPViT(input_resolution=self.image_size,
                            compute_dtype=compute_dtype, **overrides)
            apply_kwargs = {}
        else:
            raise ValueError(f"unknown extractor model '{model_name}'")

        if checkpoint is not None:
            from ..utils.torch_import import load_torch_state_dict
            state = load_torch_state_dict(checkpoint)
            if model_name == "conch":
                params = import_conch_visual_state(
                    state, layers=model.layers, image_size=self.image_size,
                    patch_size=model.patch_size)
            else:
                params = import_clip_vit_state(
                    state, layers=model.layers, image_size=self.image_size,
                    patch_size=model.patch_size)
            params = jax.tree.map(jnp.asarray, params)
        elif trunk_quant:
            # random-weight path: init the FLOAT tower (real random weights),
            # then quantize — the quantized module's own init is all-zeros.
            float_overrides = dict(overrides)
            float_overrides.pop("trunk_quantized", None)
            float_model = ConchVisualModel(image_size=self.image_size,
                                           compute_dtype=compute_dtype,
                                           **float_overrides)
            params = float_model.init(jax.random.PRNGKey(seed),
                                      dummy)["params"]
        else:
            params = model.init(jax.random.PRNGKey(seed), dummy)["params"]

        if trunk_quant:
            # Fit the int8 grid to the unrounded f32 weights (before the
            # bf16 pre-cast of the remaining float leaves below).
            from ..models.precision import quantize_vision_tower_weights
            params = quantize_vision_tower_weights(params)

        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            # The tower is frozen: pre-cast its matmul/conv weights once
            # (bit-identical to the in-graph per-step cast, and halves the
            # tower's weight HBM traffic).
            from ..models.precision import cast_vision_tower_weights
            params = cast_vision_tower_weights(params)

        def fwd(p, x):
            return model.apply({"params": p}, x, **apply_kwargs)

        self._params = params
        if device_preprocess == "auto":
            device_preprocess = jax.default_backend() == "tpu"
        self._device_preprocess = bool(device_preprocess)
        self._fwd_raw = fwd
        self._u8_pipelines = {}  # (H, W) -> jitted u8 batch -> features
        self._in_shardings = None
        if num_devices and num_devices > 1:
            # Multi-chip extraction: slides are embarrassingly parallel, so
            # the batch axis shards over a 1-D data mesh (params replicated)
            # and each chip encodes batch/num_devices tiles — linear scaling
            # with zero inter-chip collectives in the forward.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            devs = jax.devices()[:num_devices]
            if len(devs) < num_devices:
                raise ValueError(f"requested {num_devices} devices, "
                                 f"have {len(devs)}")
            if self.batch_size % num_devices:
                raise ValueError(f"batch_size {self.batch_size} not divisible"
                                 f" by num_devices {num_devices}")
            mesh = Mesh(np.array(devs), ("data",))
            rep = NamedSharding(mesh, PartitionSpec())
            shard = NamedSharding(mesh, PartitionSpec("data"))
            self._params = jax.device_put(params, rep)
            self._in_shardings = (rep, shard)
            self._fwd = jax.jit(fwd, in_shardings=(rep, shard),
                                out_shardings=shard)
        else:
            self._fwd = jax.jit(fwd)
        self._jax = jax
        self._jnp = jnp
        self.feat_dim = int(self._fwd(params, dummy if self.batch_size == 1
                                      else jnp.zeros(
                                          (self.batch_size, 3, self.image_size,
                                           self.image_size), jnp.float32)
                                      ).shape[-1])

    def preprocess(self, tiles) -> np.ndarray:
        """uint8 tiles -> f32 [N, 3, S, S] (reference-exact transform)."""
        return preprocess_batch(tiles, self.image_size,
                                OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)

    def _run_batched(self, fn, x: np.ndarray) -> np.ndarray:
        """Dispatch `x` through jitted `fn` in `batch_size` chunks (ragged
        tail zero-padded and sliced off).  Dispatches don't block, so device
        compute for batch i overlaps the host work for batch i+1."""
        N, B = x.shape[0], self.batch_size
        if N == 0:
            return np.zeros((0, self.feat_dim), np.float32)
        outs = []
        for i in range(0, N, B):
            chunk = x[i:i + B]
            if chunk.shape[0] < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - chunk.shape[0],) + chunk.shape[1:],
                                     chunk.dtype)], axis=0)
            outs.append(fn(self._params, self._jnp.asarray(chunk)))
        return np.concatenate([np.asarray(o) for o in outs], axis=0)[:N]

    def extract_preprocessed(self, x: np.ndarray) -> np.ndarray:
        """f32 [N, 3, S, S] -> f32 [N, feat_dim]."""
        return self._run_batched(self._fwd, x)

    def _u8_pipeline(self, in_hw):
        """Jitted u8-batch -> features program (device preprocessing fused
        with the tower forward), cached per input tile shape."""
        if in_hw not in self._u8_pipelines:
            from .transforms_device import build_device_preprocess
            pre = build_device_preprocess(tuple(in_hw), self.image_size)
            fwd = self._fwd_raw

            def fwd_u8(p, x):
                return fwd(p, pre(x))

            kw = {}
            if self._in_shardings is not None:
                kw = dict(in_shardings=self._in_shardings,
                          out_shardings=self._in_shardings[1])
            self._u8_pipelines[in_hw] = self._jax.jit(fwd_u8, **kw)
        return self._u8_pipelines[in_hw]

    def _extract_u8_on_device(self, arr: np.ndarray) -> np.ndarray:
        """u8 [N, H, W, 3] -> f32 [N, feat_dim], preprocessing on device."""
        return self._run_batched(self._u8_pipeline(arr.shape[1:3]), arr)

    def extract(self, tiles) -> np.ndarray:
        """uint8 tiles -> f32 [N, feat_dim] features."""
        if len(tiles) == 0:
            return np.zeros((0, self.feat_dim), np.float32)
        if self._device_preprocess:
            arr = np.asarray(tiles) if not isinstance(tiles, list) else None
            if arr is None and tiles and len({t.shape for t in tiles}) == 1:
                arr = np.stack(tiles)
            if (arr is not None and arr.ndim == 4 and arr.shape[-1] == 3
                    and arr.dtype == np.uint8):
                return self._extract_u8_on_device(arr)
        return self.extract_preprocessed(self.preprocess(tiles))


# ---------------------------------------------------------------------------
# Store writers + driver
# ---------------------------------------------------------------------------


def write_feature_store(out_dir: str, sid: str, feats: np.ndarray,
                        fmt: str = "npy",
                        coords: Optional[np.ndarray] = None,
                        coord_dir: Optional[str] = None) -> str:
    """Write one slide's features (+ optional CLAM-style coords .h5).

    Writes are ATOMIC (temp file + os.replace): `resume` relies on the
    invariant that a store file only exists once fully written, and a
    cohort job killed mid-write must not leave a truncated store that a
    restart would silently skip."""
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "npy":
        path = osp.join(out_dir, sid + ".npy")
    elif fmt == "q8npz":
        path = osp.join(out_dir, sid + ".q8npz")
    else:
        raise ValueError(f"unknown feature store format '{fmt}'")
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            if fmt == "npy":
                np.save(f, feats.astype(np.float32))
            else:
                from .pipeline import feats_inv_norms, quantize_feats_int8
                q, scale = quantize_feats_int8(feats.astype(np.float32))
                np.savez(f, q=q, scale=scale, inv=feats_inv_norms(q))
        os.replace(tmp, path)
    finally:
        if osp.exists(tmp):
            os.remove(tmp)
    if coords is not None:
        import h5py
        cdir = coord_dir or out_dir
        os.makedirs(cdir, exist_ok=True)
        cpath = osp.join(cdir, sid + ".h5")
        ctmp = cpath + ".tmp"
        try:
            with h5py.File(ctmp, "w") as hf:
                hf.create_dataset("coords", data=np.asarray(coords))
            os.replace(ctmp, cpath)
        finally:
            if osp.exists(ctmp):
                os.remove(ctmp)
    return path


def extract_to_store(source_path: str, out_dir: str,
                     extractor: FeatureExtractor,
                     fmt: str = "npy",
                     coord_dir: Optional[str] = None,
                     verbose: bool = True,
                     resume: bool = False,
                     prefetch: bool = True) -> dict:
    """Run extraction over every slide under `source_path`.

    `resume=True` skips slides whose feature store already exists, so an
    interrupted cohort-scale job restarts where it stopped (the per-slide
    store write is atomic enough: a file only exists once fully written).
    `prefetch=True` reads the next slide's tiles on a background thread
    while the device encodes the current one, overlapping host IO/decode
    with chip compute (one slide of read-ahead; real WSI cohorts stream
    TBs through this loop).

    Returns {'slides': n, 'tiles': n, 'tiles_per_sec': float,
             'skipped': n_skipped}."""
    sources = list_tile_sources(source_path)
    if not sources:
        raise FileNotFoundError(f"no tile sources under {source_path}")
    n_skipped = 0
    if resume:
        remaining = []
        for sid, src in sources:
            if osp.exists(osp.join(out_dir, f"{sid}.{fmt}")):
                n_skipped += 1
                if verbose:
                    print(f"[extract] {sid}: store exists, skipped (resume)")
            else:
                remaining.append((sid, src))
        sources = remaining

    n_tiles = 0
    n_empty = 0
    t0 = time.perf_counter()

    def process(sid, tiles, coords) -> int:
        if len(tiles) == 0:
            # an empty store would later surface as an empty training bag;
            # skip it loudly instead
            print(f"[extract] WARNING: {sid} has 0 tiles — no store written")
            return 0
        feats = extractor.extract(tiles)
        write_feature_store(out_dir, sid, feats, fmt, coords, coord_dir)
        if verbose:
            print(f"[extract] {sid}: {len(tiles)} tiles -> "
                  f"{osp.join(out_dir, sid)}.{fmt}")
        return len(tiles)

    if prefetch and len(sources) > 1:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(read_tiles, sources[0][1]) if sources else None
        try:
            for i, (sid, _src) in enumerate(sources):
                tiles, coords = pending.result()
                pending = (pool.submit(read_tiles, sources[i + 1][1])
                           if i + 1 < len(sources) else None)
                n = process(sid, tiles, coords)
                n_tiles += n
                n_empty += n == 0
        finally:
            pool.shutdown(wait=False)
    else:
        for sid, src in sources:
            tiles, coords = read_tiles(src)
            n = process(sid, tiles, coords)
            n_tiles += n
            n_empty += n == 0
    dt = time.perf_counter() - t0
    return {"slides": len(sources), "tiles": n_tiles, "skipped": n_skipped,
            "empty": n_empty,
            "tiles_per_sec": n_tiles / dt if dt > 0 else float("inf")}
