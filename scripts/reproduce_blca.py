"""One-command reproduction of the TCGA-BLCA VLSA experiment.

Given the two non-redistributable artifacts, this script reproduces the
reference's headline 5-fold BLCA run (ref config/IFMLE/tcga_blca/
cfg_vlsa_conch.yaml) end to end and prints the C-index table:

  ARTIFACT 1 — frozen CONCH weights: `pytorch_model.bin`
      (huggingface MahmoodLab/CONCH). Mount anywhere, pass --conch_ckpt.
  ARTIFACT 2 — patch features: TCGA-BLCA CONCH ViT-B/16 512-d VL-projected
      features, one .pt/.h5/.npy per slide named <pathology_id>.<ext>
      (ref README.md:88-94). Mount anywhere, pass --features.

Without artifacts it still runs end to end in synthetic mode (random tower,
synthetic bags) so the full path — tower import hook, parity gate, feature
conversion, 5-fold training, evaluation, table — is exercisable today.

Steps:
  1. tower import  (utils/torch_import.import_text_tower_from_checkpoint)
  2. parity gate   (tests/test_vlsa_full_parity.py vs the mounted reference)
  3. feature conversion to .npy for the native loader (data/convert.py)
  4. 5-fold training via the VLSA runner (same expansion main.py --multi_run
     performs for data_split_seed: [0..4]) + C-index table

Usage:
  python scripts/reproduce_blca.py --smoke                 # synthetic, fast
  python scripts/reproduce_blca.py \
      --conch_ckpt /mnt/conch/pytorch_model.bin \
      --features   /mnt/tcga_blca/feats-CONCH-vl-proj/pt_files
  # or from raw tiles (ARTIFACT 2 not needed; extraction is resumable):
  python scripts/reproduce_blca.py \
      --conch_ckpt /mnt/conch/pytorch_model.bin \
      --tiles      /mnt/tcga_blca/tiles-20x-s448
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def step_tower(args):
    if not args.conch_ckpt:
        print("[1/4] no --conch_ckpt: the text tower will be randomly "
              "initialised (architecture-faithful synthetic mode)")
        return None
    from vlsa_tpu.utils.torch_import import import_text_tower_from_checkpoint
    vl = import_text_tower_from_checkpoint(args.conch_ckpt, api="CONCH")
    import jax
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(vl["text_params"]))
    print(f"[1/4] imported CONCH text tower from {args.conch_ckpt} "
          f"({n/1e6:.1f}M params, logit_scale="
          f"{vl.get('logit_scale', 'absent')})")
    return args.conch_ckpt


def step_parity(args):
    if args.skip_parity:
        print("[2/4] parity gate skipped (--skip_parity)")
        return
    if not osp.isdir("/root/reference"):
        print("[2/4] parity gate skipped: reference repo not mounted")
        return
    print("[2/4] running full-model parity vs the mounted reference ...")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q",
         "tests/test_vlsa_full_parity.py::test_full_vlsa_incidence_parity"],
        cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("[2/4] parity gate FAILED — aborting reproduction")
    print("[2/4] parity gate passed (incidence deviation <= 1e-3)")


def step_extract(args):
    """Optional step 0: raw WSI tiles -> CONCH ViT-B/16 448 features, so
    ARTIFACT 2 can be replaced by tile sources (one .h5/.npy/dir per
    slide, named <pathology_id>). Resumable; reuses an existing store."""
    if not args.tiles:
        return
    import jax
    from vlsa_tpu.data.extract import FeatureExtractor, extract_to_store
    dst = args.extracted_dir or (args.tiles.rstrip("/") + "-feats")
    size = 64 if args.smoke else 448
    overrides = None
    if args.smoke and not args.conch_ckpt:
        overrides = {"layers": 2, "width": 48, "heads": 4,
                     "embed_dim_contrast": 512, "embed_dim_caption": 32,
                     "attn_pooler_heads": 4, "n_queries_caption": 4}
    ex = FeatureExtractor(
        model_name="conch", checkpoint=args.conch_ckpt, image_size=size,
        batch_size=16 if args.smoke else 64,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu"
        else "float32", model_overrides=overrides)
    stats = extract_to_store(args.tiles, dst, ex, fmt="npy", resume=True,
                             verbose=not args.smoke)
    print(f"[0/4] extracted {stats['tiles']} tiles over {stats['slides']} "
          f"slides ({stats['skipped']} already present) -> {dst} "
          f"[{stats['tiles_per_sec']:.1f} tiles/s]"
          + ("" if args.conch_ckpt else " (random tower init)"))
    args.features = dst
    args.no_convert = True  # extraction writes native .npy stores
    args.feat_format = "npy"


def _detect_feat_format(feat_dir: str) -> str:
    exts = {osp.splitext(f)[1].lstrip(".") for f in os.listdir(feat_dir)}
    # priority order: extraction writes coords .h5 SIDECARS next to the
    # .npy/.q8npz stores, so .h5 only wins when it is the only candidate
    for ext in ("q8npz", "npy", "pt", "h5"):
        if ext in exts:
            return ext
    raise SystemExit(f"no .pt/.npy/.h5/.q8npz feature files in {feat_dir}")


def step_features(args):
    if not args.features:
        spec = "synthetic://N=1024,D=512,seed=7" if args.smoke \
            else "synthetic://N=8192,D=512,seed=7"
        print(f"[3/4] no --features: using {spec}")
        return spec
    if not osp.isdir(args.features):
        raise SystemExit(f"[3/4] --features dir not found: {args.features} "
                         "(expected one .pt/.h5/.npy per slide, named "
                         "<pathology_id>.<ext> — ref README.md:88-94)")
    if args.no_convert:
        args.feat_format = args.feat_format or _detect_feat_format(
            args.features)
        print(f"[3/4] using features at {args.features} directly "
              f"(format: {args.feat_format})")
        return args.features
    from vlsa_tpu.data.convert import convert_dir
    dst = args.converted_dir or (args.features.rstrip("/") + "-npy")
    if osp.isdir(dst) and os.listdir(dst):
        print(f"[3/4] converted store already at {dst}")
    else:
        n = convert_dir(args.features, dst)
        print(f"[3/4] converted {n} slides -> {dst} (native-loader format)")
    args.feat_format = "npy"
    return dst


def build_cfg(args, fold, path_patch):
    """The reference's cfg_vlsa_conch.yaml surface for one fold
    (configs/vlsa_conch_blca.yaml with the grid collapsed)."""
    from vlsa_tpu.config import load_config
    cfg = load_config(osp.join(REPO, "configs", "vlsa_conch_blca.yaml"))
    # collapse the grid the way main.py --multi_run would per grid point
    for k, v in list(cfg.items()):
        if isinstance(v, list):
            cfg[k] = v[0]
    cfg.update({
        "dataset_name": "tcga_blca",
        "data_split_seed": fold,
        "path_patch": path_patch,
        "path_clip_model": args.conch_ckpt,
        "save_path": osp.join(args.out, f"blca-fold{fold}"),
        "epochs": args.epochs,
        "bag_overflow": "error",
    })
    if getattr(args, "feat_format", None):
        # the converted/extracted store's actual on-disk format (the
        # exemplar config says `pt`, which only fits raw reference dumps)
        cfg["feat_format"] = args.feat_format
    if args.smoke:
        cfg["_test_tower_overrides"] = {"width": 32, "heads": 4, "layers": 2,
                                        "output_dim": 512}
        cfg["min_bucket"] = 256
    if args.mesh_data:
        cfg["mesh"] = {"data": args.mesh_data, "model": args.mesh_model}
    return cfg


def step_run(args, path_patch):
    from vlsa_tpu.runner import VLSAHandler
    rows = []
    for fold in args.folds:
        print(f"[4/4] fold {fold}: training ...")
        cfg = build_cfg(args, fold, path_patch)
        handler = VLSAHandler(cfg)
        metrics = handler.exec()
        row = {"fold": fold}
        for split, pairs in metrics.items():
            d = dict(pairs)
            row[f"{split}_c_index"] = d.get("pred_c_index")
            row[f"{split}_loss"] = d.get("pred_loss")
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conch_ckpt", default=None,
                    help="ARTIFACT 1: path to CONCH pytorch_model.bin")
    ap.add_argument("--features", default=None,
                    help="ARTIFACT 2: dir of per-slide .pt/.h5/.npy features")
    ap.add_argument("--tiles", default=None,
                    help="raw tile sources instead of ARTIFACT 2 (one "
                         ".h5/.npy/image-dir per slide, named "
                         "<pathology_id>): runs CONCH ViT-B/16 448 "
                         "extraction first")
    ap.add_argument("--extracted_dir", default=None,
                    help="where --tiles extraction writes its .npy store")
    ap.add_argument("--feat_format", default=None,
                    choices=["pt", "npy", "h5", "q8npz"],
                    help="on-disk format of --features (default: detected)")
    ap.add_argument("--converted_dir", default=None)
    ap.add_argument("--no_convert", action="store_true",
                    help="read --features directly (skip .npy conversion)")
    ap.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--out", default="result/reproduce-blca")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny tower + tiny synthetic bags + 1 epoch + fold 0")
    ap.add_argument("--skip_parity", action="store_true")
    ap.add_argument("--mesh_data", type=int, default=None,
                    help="data-parallel mesh axis (chips)")
    ap.add_argument("--mesh_model", type=int, default=1)
    args = ap.parse_args()
    if args.smoke:
        args.folds = args.folds if args.folds != [0, 1, 2, 3, 4] else [0]
        args.epochs = args.epochs or 1
        args.skip_parity = True
        # smoke mode runs host-side (the TPU tunnel would spend minutes
        # compiling per bucket length for a toy model)
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.epochs is None:
        args.epochs = 30  # ref cfg_vlsa_conch.yaml epochs

    step_tower(args)
    step_parity(args)
    step_extract(args)
    path_patch = step_features(args)
    rows = step_run(args, path_patch)

    print("\n===== TCGA-BLCA VLSA (IFMLE+EMD) 5-fold reproduction =====")
    print(f"{'fold':>4} {'val c-index':>12} {'test c-index':>13}")
    test_cis = []
    for r in rows:
        ci_v = r.get("validation_c_index")
        ci_t = r.get("test_c_index")
        test_cis.append(ci_t)
        print(f"{r['fold']:>4} "
              f"{('%.4f' % ci_v) if ci_v is not None else '—':>12} "
              f"{('%.4f' % ci_t) if ci_t is not None else '—':>13}")
    cis = [c for c in test_cis if c is not None]
    if cis:
        print(f"mean test c-index: {np.mean(cis):.4f} ± {np.std(cis):.4f}")
    os.makedirs(args.out, exist_ok=True)
    with open(osp.join(args.out, "summary.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(f"summary written to {osp.join(args.out, 'summary.json')}")


if __name__ == "__main__":
    main()
