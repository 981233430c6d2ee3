"""Live TPU training demo: SA-ABMIL on the bundled TCGA-BLCA fold-0 split
with synthetic CONCH-shaped bags (the real features are not distributable).

Exercises the full runner on hardware: prefetch pipeline -> padded fixed
bucket -> fused ABMIL Pallas kernel -> jitted train step -> SurvivalEVAL
metrics, and prints epoch slides/sec.

Note on the number: each bag is synthesised on the host (~16 MB) and shipped
to the device every step, so in a remote-TPU (tunnelled) environment the
epoch rate measures host RNG + link bandwidth, not device speed — bench.py
isolates the device step (2166 slides/s on one v5e chip).  On a TPU VM the
transfers ride PCIe/DMA and the runner's prefetch thread overlaps them.

    python examples/tpu_train_demo.py [--epochs 2] [--n 8192]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--save", default="/tmp/tpu-demo")
    args = ap.parse_args()

    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()

    from vlsa_tpu.runner import SAHandler

    cfg = {
        "task": "sa", "seed": 42, "save_path": args.save,
        "save_prediction": True, "ckpt_for_eval": "last", "num_shot": -1,
        "dataset_name": "tcga_blca",
        "path_patch": f"synthetic://N={args.n},D=512,seed=7,jitter=0",
        "path_table": "assets/data_split/5foldcv/tcga_blca/mahmoodlab_tcga_blca_survival.csv",
        "data_mode": "patch", "feat_format": "pt",
        "time_format": "interval", "time_bins": None,
        "data_split_path": "assets/data_split/5foldcv/tcga_blca/splits_0.csv",
        "data_split_seed": 0,
        "arch": "DeepMIL", "init_wt": False,
        "net_output_converter": "softmax", "net_dims": "512-256-4",
        "deepmil_network": "ABMIL", "deepmil_pooling": "attention",
        "deepmil_use_feat_proj": False,
        "loss_type": "SurvIFMLE", "loss_survifmle_weight": 1.0,
        "evaluator": "NLL-IF",
        "opt_name": "adam", "opt_lr": 2e-4, "opt_weight_decay": 1e-5,
        "epochs": args.epochs, "batch_size": 1, "bp_every_batch": 32,
        "es": False, "lrs": False, "test": False,
        "monitor_metrics": "loss",
        "fixed_bucket": args.n,        # one XLA program for the whole run
        "feats_dtype": "bfloat16",
        "eval_batch_size": 32,
    }
    handler = SAHandler(cfg)
    metrics = handler.exec()
    print("[demo] final metrics:", metrics)


if __name__ == "__main__":
    main()
