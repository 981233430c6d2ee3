#!/usr/bin/env python
"""Extract patch features from WSI tiles with the TPU vision tower.

The driver for the reference's preprocessing story (ref README.md:88-94:
448x448 tiles at 20x -> CONCH image encoder -> 512-d per-patch features),
built on vlsa_tpu.data.extract.  Consumes CLAM-style .h5 tile files, .npy
u8 stacks, or directories of images; emits .npy / .q8npz feature stores (+
coords .h5) that `main.py` runs train on directly (cfg `path_patch` /
`feat_format`).

Examples:
  # extract a directory of per-slide .h5 tile files with real CONCH weights
  python scripts/extract_features.py --source /data/tiles --out /data/feats \
      --ckpt /weights/conch/pytorch_model.bin --format q8npz

  # synthetic smoke/benchmark (no tiles or weights needed)
  python scripts/extract_features.py --synthetic 2 --synthetic_tiles 128 \
      --out /tmp/feats
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", type=str, default=None,
                   help="slide tile source: dir of .h5/.npy/image-dirs, or one such source")
    p.add_argument("--out", type=str, required=True, help="output feature-store dir")
    p.add_argument("--model", type=str, default="conch",
                   choices=["conch", "clip_vit"])
    p.add_argument("--ckpt", type=str, default=None,
                   help="torch checkpoint (CONCH pytorch_model.bin / CLIP state dict); random init if omitted")
    p.add_argument("--format", type=str, default="npy", choices=["npy", "q8npz"])
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image_size", type=int, default=448)
    p.add_argument("--trunk_quant", action="store_true",
                   help="w8a8 int8 trunk linears (CONCH only): 2x MXU rate, "
                        "opt-in semantics change — see docs/PERF.md")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_devices", type=int, default=None,
                   help="shard each tile batch over this many chips "
                        "(params replicated, batch split — linear scaling); "
                        "default: single device")
    p.add_argument("--device_preprocess", type=str, default="auto",
                   choices=["auto", "0", "1"],
                   help="run the transform stack on device (byte-exact "
                        "int32 fixed-point resize fused with the tower); "
                        "auto = on for TPU backends")
    p.add_argument("--platform", type=str,
                   default=os.environ.get("JAX_PLATFORMS") or None,
                   help="force the jax platform (e.g. cpu, tpu); defaults "
                        "to $JAX_PLATFORMS, applied via jax.config so it "
                        "wins over a sitecustomize pin")
    p.add_argument("--resume", action="store_true",
                   help="skip slides whose feature store already exists "
                        "(restart an interrupted cohort job)")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the background-thread tile read-ahead "
                        "that overlaps host IO with device compute")
    p.add_argument("--coord_dir", type=str, default=None,
                   help="where to write coords .h5 (default: --out)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic slides instead of reading --source")
    p.add_argument("--synthetic_tiles", type=int, default=64,
                   help="tiles per synthetic slide")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def make_synthetic_slides(root: str, n_slides: int, n_tiles: int,
                          image_size: int, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    for i in range(n_slides):
        tiles = rng.integers(0, 256, size=(n_tiles, image_size, image_size, 3),
                             dtype=np.uint8)
        np.save(osp.join(root, f"synthetic_{i}.npy"), tiles)


def _enable_compile_cache():
    """Persistent XLA compilation cache: extraction runs are one-shot CLI
    invocations, so without this every run pays the full tower compile
    (minutes on TPU, ~8 min for the unrolled trunk on a weak CPU host)."""
    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache(os.environ.get(
        "VLSA_TPU_COMPILE_CACHE", osp.expanduser("~/.cache/jax_comp_cache")))


def _apply_platform(platform):
    """Honor an explicit platform before any device is touched.  Some
    environments pin the platform in sitecustomize, so the JAX_PLATFORMS
    env var alone is not enough (same rationale as main.py's
    apply_platform_config)."""
    if platform:
        import jax
        jax.config.update("jax_platforms", str(platform))


def main():
    args = get_args()
    _apply_platform(args.platform)
    _enable_compile_cache()
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store

    source = args.source
    tmp = None
    if args.synthetic:
        tmp = tempfile.TemporaryDirectory(prefix="vlsa_tiles_")
        make_synthetic_slides(tmp.name, args.synthetic, args.synthetic_tiles,
                              args.image_size, args.seed)
        source = tmp.name
    if source is None:
        raise SystemExit("either --source or --synthetic is required")

    dev_pre = (args.device_preprocess if args.device_preprocess == "auto"
               else args.device_preprocess == "1")
    extractor = FeatureExtractor(
        model_name=args.model, checkpoint=args.ckpt,
        image_size=args.image_size, batch_size=args.batch,
        compute_dtype=args.dtype, num_devices=args.num_devices,
        device_preprocess=dev_pre, seed=args.seed,
        trunk_quant=args.trunk_quant)
    stats = extract_to_store(source, args.out, extractor, fmt=args.format,
                             coord_dir=args.coord_dir, resume=args.resume,
                             prefetch=not args.no_prefetch)
    stats.update(model=args.model, format=args.format,
                 image_size=args.image_size, feat_dim=extractor.feat_dim,
                 weights="imported" if args.ckpt else "random-init")
    print(json.dumps(stats))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
