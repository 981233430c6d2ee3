"""VLSA walkthrough — mirror of the reference's notebook
(ref notebook/VLSA-Walkthrough.ipynb): load a trained VLSA, run one WSI bag
through it, plot the incidence/survival functions, the decoupled text-image
similarities, and the exact-Shapley attribution of the prognostic priors.

Run:  python examples/walkthrough.py [--ckpt <train_model-last.pth>]
          [--bag <feats.pt|.npy> | --tiles <dir|.h5|.npy> [--conch_ckpt <bin>]]

Without arguments it builds the BLCA-configured model, imports the bundled
reference checkpoint if mounted, and uses a synthetic bag (the reference's
demo WSI blob is not distributable).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/reference/assert/blca-train-VLSA/train_model-last.pth")
    ap.add_argument("--bag", default=None, help=".pt/.npy patch-feature bag")
    ap.add_argument("--tiles", default=None,
                    help="raw tile source (.h5/.npy stack/dir of images): "
                         "runs the CONCH vision tower to build the bag "
                         "(the full pixels->prognosis path)")
    ap.add_argument("--conch_ckpt", default=None,
                    help="pytorch_model.bin with real CONCH vision weights "
                         "for --tiles (random init otherwise)")
    ap.add_argument("--tile_image_size", type=int, default=448)
    ap.add_argument("--platform", default=os.environ.get("JAX_PLATFORMS") or None,
                    help="force the jax platform (e.g. cpu); applied via "
                         "jax.config so it wins over a sitecustomize pin")
    ap.add_argument("--out", default="walkthrough_out")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", str(args.platform))
    from vlsa_tpu.models.vlsa_build import build_vlsa
    from vlsa_tpu.interpret import calc_text_img_similarity
    from vlsa_tpu.interpret.visualization import (
        plot_attention_heatmap,
        plot_incidence_survival,
        plot_ordinality_heatmap,
        plot_shap_bars,
        plot_wsi_heatmap,
    )
    from vlsa_tpu.data.io import load_init_text, read_patch_data

    os.makedirs(args.out, exist_ok=True)

    # BLCA run configuration (ref assert/blca-train-VLSA/config.yaml)
    model, params, _tok = build_vlsa(
        vlsa_api="CONCH",
        text_encoder_cfg={"name": "mahmoodlab/conch", "frozen": True},
        image_encoder_cfg={
            "name": "VLFAN", "dim_in": 512, "dim_hid": 256,
            "use_feat_proj": False, "drop_rate": 0.25, "pred_head": "default",
            "query": "Text", "num_query": 12, "query_pooling": "mean",
            "gated_query": False,
            "query_text_method": "TaskRes", "query_text_res_ratio": 0.5,
            "query_text_load_path": "vlsa_tpu/assets/tools/survival_text_prototypes.json",
            "query_text_load_idx": "tcga_blca_0",
        },
        prompt_learner_cfg={
            "name": "CoOp", "method": "rank", "pretrained": False,
            "num_ranks": 12, "num_base_ranks": 4, "num_tokens_per_rank": 4,
            "num_context_tokens": 8, "rank_tokens_position": "tail",
            "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
            "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
            "rank_specific_context": False,
        },
        rng=jax.random.PRNGKey(0),
    )

    if args.ckpt and os.path.exists(args.ckpt):
        from vlsa_tpu.utils.torch_import import (
            import_vlsa_learnable_state, load_torch_state_dict)
        params = import_vlsa_learnable_state(params, load_torch_state_dict(args.ckpt))
        print(f"[walkthrough] imported learnable params from {args.ckpt}")
    else:
        print("[walkthrough] no checkpoint found; using random init "
              "(the frozen CONCH weights are not distributable either way)")

    if args.tiles:
        # raw pixels -> CONCH ViT-B features (ref README.md:88-94 preprocessing:
        # 448x448 tiles through the CONCH vision tower, 512-d VL-projected)
        from vlsa_tpu.data.extract import FeatureExtractor, read_tiles
        tiles, _coords = read_tiles(args.tiles)
        ex = FeatureExtractor(
            model_name="conch", checkpoint=args.conch_ckpt,
            image_size=args.tile_image_size, batch_size=16,
            compute_dtype="bfloat16" if jax.default_backend() == "tpu"
            else "float32")
        X = ex.extract(tiles)
        print(f"[walkthrough] extracted {X.shape[0]} tiles -> "
              f"{X.shape[1]}-d CONCH features"
              + ("" if args.conch_ckpt else " (random tower init)"))
    elif args.bag:
        X = read_patch_data(args.bag).astype(np.float32)
    else:
        X = np.random.default_rng(0).normal(size=(4096, 512)).astype(np.float32)
        print("[walkthrough] using a synthetic 4096-patch bag")

    out = calc_text_img_similarity(model, params, X)
    print("[walkthrough] incidence function:", np.round(out["probs"][0], 4))
    print("[walkthrough] SHAP importances:", np.round(out["shap_importance"], 4))

    priors = load_init_text("vlsa_tpu/assets/tools/survival_text_prototypes.json",
                            key="tcga_blca_0")
    short = [p[:60] + ("…" if len(p) > 60 else "") for p in priors]
    plot_incidence_survival(out["probs"],
                            save_path=os.path.join(args.out, "incidence.png"))
    plot_shap_bars(out["shap_importance"], short,
                   save_path=os.path.join(args.out, "shap.png"))
    rank_embeds = np.asarray(params["prompt_learner"]["rank_embeds"])
    _, span_acc = plot_ordinality_heatmap(
        rank_embeds, save_path=os.path.join(args.out, "ordinality.png"))
    print(f"[walkthrough] rank-embedding span accuracy: {span_acc:.3f}")

    # spatial maps (ref utils/visualization.py:181-241, 311-359): patch
    # coordinates come from the slide's coord file in production
    # (data.io.read_patch_coord); synthetic bags get a square grid
    N = X.shape[0]
    side = int(np.ceil(np.sqrt(N)))
    grid = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)
    coords = grid[:N] * 256
    A = out["coattn_score"]                       # [P, N]
    labels = np.argmax(A, axis=0)                 # per-patch dominant prior
    plot_wsi_heatmap(coords, labels, patch_size=256, downsample=32,
                     save_path=os.path.join(args.out, "wsi_heatmap.png"))
    plot_attention_heatmap(A, coords, patch_size=256, downsample=32,
                           prior_names=[f"prior {i}" for i in range(A.shape[0])],
                           save_path=os.path.join(args.out, "attention_heatmaps.png"))

    # --- ABMIL interpretation variant (ref utils/model_inference.py:146-178):
    # the SA-family story — a VLSA assembly with an ABMIL (DeepMIL) encoder;
    # patch attention + bin probabilities, plotted on the same surface ---
    from vlsa_tpu.interpret import calc_abmil_text_img_similarity
    abmil_model, abmil_params, _ = build_vlsa(
        vlsa_api="CONCH",
        text_encoder_cfg={"name": "mahmoodlab/conch", "frozen": True},
        image_encoder_cfg={
            "name": "DeepMIL", "dim_in": 512, "dim_hid": 256,
            "use_feat_proj": False, "drop_rate": 0.25,
            "pred_head": "Adapter", "pooling": "attention",
        },
        prompt_learner_cfg={
            "name": "CoOp", "method": "rank", "pretrained": False,
            "num_ranks": 12, "num_base_ranks": 4, "num_tokens_per_rank": 4,
            "num_context_tokens": 8, "rank_tokens_position": "tail",
            "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
            "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
            "rank_specific_context": False,
        },
        rng=jax.random.PRNGKey(1),
    )
    ab = calc_abmil_text_img_similarity(abmil_model, abmil_params, X)
    print("[walkthrough] ABMIL incidence function:", np.round(ab["probs"][0], 4))
    plot_attention_heatmap(ab["attention"], coords, patch_size=256,
                           downsample=32, prior_names=["ABMIL attention"],
                           save_path=os.path.join(args.out, "abmil_attention.png"))
    print(f"[walkthrough] plots written to {args.out}/")


if __name__ == "__main__":
    main()
