"""Measure the reference denominator on THIS host (SURVEY.md §6).

The reference publishes no throughput numbers, so `bench.py`'s vs_baseline
so far rested on an analytic estimate of its GPU cost.  This script anchors
it with a *measurement*: it runs the ACTUAL reference training-step
semantics — the mounted `/root/reference` code, torch CPU, heavy pip deps
stubbed, full-size CONCH text tower — and our JAX build on the SAME CPU,
and records the measured CPU-vs-CPU ratio to `BASELINE_MEASURED.json`.
`bench.py` then reports this measured ratio alongside the analytic GPU
estimate.

Reference semantics measured (ref runner/vlsa_handler.py:189-289):
  batch_size=1 bags, `bp_every_batch` sequential forwards each re-running
  the 12-layer text tower, per-bag backward (tower frozen but the graph
  still runs through its activations: the prompt embeds are trainable),
  one Adam step per accumulation window.

Ours: one jitted train step over the same `bp_every_batch` bags (identical
averaged gradient — see vlsa_tpu/runner/engine.py docstring).

Usage:
  python scripts/measure_reference.py                  # full-size, ~5 min
  python scripts/measure_reference.py --small          # tiny tower (smoke)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = os.environ.get("VLSA_REFERENCE_ROOT", "/root/reference")

# CONCH ViT-B/16 text-tower geometry (ref model/conch/model_configs/
# conch_ViT-B-16.json: context 128, width 768, heads 12, layers 12, 512-d out)
FULL = dict(width=768, heads=12, layers=12, output_dim=512)
SMALL = dict(width=64, heads=4, layers=2, output_dim=512)
CTX, VOCAB = 128, 32007
NUM_RANKS, NUM_QUERY, DIM_IN, K = 12, 12, 512, 12


def build_reference_model(tower_cfg):
    """Reference VLSA with the real text tower + VLFAN, CoCa factory bypassed
    (the 1.3GB checkpoint is not distributable; geometry is identical)."""
    from vlsa_tpu.utils.ref_stubs import install_reference_stubs
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_conch_tf_bench", os.path.join(REFERENCE_ROOT, "model/conch/transformer.py"))
    ref_tf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tf)

    torch.manual_seed(0)
    tt = ref_tf.TextTransformer(
        context_length=CTX, vocab_size=VOCAB, embed_cls=True,
        output_tokens=False, **tower_cfg)

    import model.vlsa as ref_vlsa_mod
    from model.deepmil import VLFAN as RefVLFAN

    image_encoder_cfg = {
        "name": "VLFAN", "dim_in": DIM_IN, "dim_hid": 256,
        "use_feat_proj": False, "drop_rate": 0.25, "pred_head": "default",
        "query": "Text", "num_query": NUM_QUERY, "query_pooling": "mean",
        "gated_query": False,
        "query_text_method": "TaskRes", "query_text_res_ratio": 0.5,
        "query_text_load_path": "vlsa_tpu/assets/tools/survival_text_prototypes.json",
        "query_text_load_idx": "tcga_blca_0",
    }
    prompt_learner_cfg = {
        "name": "CoOp", "method": "rank", "pretrained": False,
        "num_ranks": NUM_RANKS, "num_base_ranks": 4, "num_tokens_per_rank": 4,
        "num_context_tokens": 8, "rank_tokens_position": "tail",
        "init_prompt_path": "vlsa_tpu/assets/tools/survival_prompts.json",
        "init_prompt_context_idx": 0, "init_prompt_rank_idx": 0,
        "rank_specific_context": False,
    }

    def fake_load_vl_model(text_cfg, image_cfg, root, api):
        vlfan = RefVLFAN(**{k: v for k, v in image_cfg.items()})
        return types.SimpleNamespace(
            text=tt, visual=vlfan,
            logit_scale=torch.nn.Parameter(torch.ones([]) * float(np.log(1 / 0.07))))

    orig = ref_vlsa_mod.load_vl_model_to_cpu
    ref_vlsa_mod.load_vl_model_to_cpu = fake_load_vl_model
    try:
        torch.manual_seed(1)
        model = ref_vlsa_mod.VLSA(
            text_encoder_cfg={"name": "mahmoodlab/conch"},
            image_encoder_cfg=image_encoder_cfg,
            prompt_learner_cfg=prompt_learner_cfg,
            vlsa_api="CONCH", path_clip_model="unused")
    finally:
        ref_vlsa_mod.load_vl_model_to_cpu = orig

    # production freezing (ref runner/vlsa_handler.py:126-149): tower frozen,
    # prompt learner + VLFAN adapter + logit_scale trainable
    for p in model.prompt_encoder.parameters():
        p.requires_grad_(False)
    return model


def measure_reference(tower_cfg, n_patches, bp_every_batch, n_bags):
    """slides/sec of the reference per-bag train loop on torch CPU."""
    model = build_reference_model(tower_cfg)  # installs stubs + sys.path
    import torch
    from loss.loss_surv import SurvIFMLE
    from loss.loss_surv_ext import SurvEMD
    model.train()
    opt = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad], lr=2e-4,
        weight_decay=1e-5)
    ifmle = SurvIFMLE()
    emd = SurvEMD(p=2)

    rng = np.random.default_rng(0)
    bags = [torch.tensor(rng.normal(size=(1, n_patches, DIM_IN)).astype(np.float32))
            for _ in range(2)]  # rotate 2 bags; data content doesn't matter
    ts = torch.tensor([3]), torch.tensor([7])
    es = torch.tensor([1.0]), torch.tensor([0.0])

    def run_bags(count, measure):
        t0 = time.perf_counter()
        for i in range(count):
            X = bags[i % 2]
            pred, _img, _txt = model(X)
            probs = torch.softmax(pred, dim=-1)
            t, e = ts[i % 2], es[i % 2]
            loss = ifmle(probs, t, e) + emd(
                probs, t, e, cur_logit_scale=model.logit_scale.exp())
            (loss / bp_every_batch).backward()
            if (i + 1) % bp_every_batch == 0:
                opt.step()
                opt.zero_grad()
        return time.perf_counter() - t0

    run_bags(1, measure=False)  # warmup (allocator, thread pools)
    opt.zero_grad()
    dt = run_bags(n_bags, measure=True)
    return n_bags / dt, dt / n_bags


def measure_ours_cpu(tower_cfg, n_patches, batch, n_steps=3):
    """slides/sec of our jitted train step on the same CPU."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from vlsa_tpu.losses import surv_emd, surv_ifmle
    from vlsa_tpu.optim import create_optimizer

    small = tower_cfg["width"] != FULL["width"]
    model, params = _build_flagship(small=small, tower_dtype="float32")

    frozen = jax.tree.map(lambda _: False, dict(params))
    frozen["prompt_encoder"] = jax.tree.map(
        lambda _: True, dict(params)["prompt_encoder"])
    tx = create_optimizer("adam", 2e-4, 1e-5, params, frozen=frozen)
    opt_state = tx.init(params)

    def train_step(params, opt_state, feats, mask, t, e):
        def loss_fn(p):
            p = dict(p, prompt_encoder=jax.lax.stop_gradient(p["prompt_encoder"]))
            logits, _i, _t = model.apply({"params": p}, feats, mask)
            probs = jax.nn.softmax(logits, axis=-1)
            ls = jnp.exp(p["logit_scale"])
            return surv_ifmle(probs, t, e) + surv_emd(probs, t, e, ls)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(batch, n_patches, DIM_IN)).astype(np.float32))
    mask = jnp.ones((batch, n_patches), bool)
    t = jnp.asarray(rng.integers(0, K, size=batch), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=batch), jnp.float32)

    params, opt_state, loss = step(params, opt_state, feats, mask, t, e)
    _ = float(loss)  # compile + warmup
    t0 = time.perf_counter()
    for _i in range(n_steps):
        params, opt_state, loss = step(params, opt_state, feats, mask, t, e)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    return batch / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny tower smoke mode (CI); full CONCH size otherwise")
    ap.add_argument("--n_patches", type=int, default=10240)
    ap.add_argument("--bp_every_batch", type=int, default=32)
    ap.add_argument("--ref_bags", type=int, default=None,
                    help="bags to time for the reference loop")
    ap.add_argument("--repeats", type=int, default=5,
                    help="independent timing repeats; the report leads with "
                         "median +/- MAD so the ratio is robust to host noise")
    ap.add_argument("--out", default="BASELINE_MEASURED.json")
    args = ap.parse_args()

    tower_cfg = SMALL if args.small else FULL
    ref_bags = args.ref_bags or (16 if not args.small else 4)

    if not os.path.isdir(REFERENCE_ROOT):
        print(json.dumps({"error": f"reference not mounted at {REFERENCE_ROOT}"}))
        return

    print(f"[measure] reference torch-CPU loop: {args.repeats} x {ref_bags} "
          f"bags x {args.n_patches} patches, tower {tower_cfg} ...")
    ref_runs = []
    for r in range(args.repeats):
        ref_sps, ref_per_bag = measure_reference(
            tower_cfg, args.n_patches, args.bp_every_batch, ref_bags)
        ref_runs.append(ref_sps)
        print(f"[measure] reference run {r + 1}/{args.repeats}: "
              f"{ref_sps:.3f} slides/sec ({ref_per_bag*1e3:.1f} ms/bag)")

    print("[measure] ours (JAX CPU, same host) ...")
    ours_runs = []
    for r in range(args.repeats):
        ours_sps, ours_step = measure_ours_cpu(
            tower_cfg, args.n_patches, args.bp_every_batch)
        ours_runs.append(ours_sps)
        print(f"[measure] ours run {r + 1}/{args.repeats}: {ours_sps:.2f} "
              f"slides/sec ({ours_step*1e3:.1f} ms / "
              f"{args.bp_every_batch}-bag step)")

    # median + MAD: a single descheduled repeat cannot drag the headline
    # ratio (VERDICT r3 next#5 — the mean-based round-3 ratio had a 2x
    # min/max spread from 3 repeats x 8 bags)
    med = lambda runs: float(np.median(runs))
    mad = lambda runs: float(np.median(np.abs(np.array(runs) - np.median(runs))))
    ref_sps, ref_mad = med(ref_runs), mad(ref_runs)
    ours_sps, ours_mad = med(ours_runs), mad(ours_runs)
    import multiprocessing
    result = {
        "host": f"cpu x{multiprocessing.cpu_count()}",
        "tower": tower_cfg,
        "n_patches": args.n_patches,
        "bp_every_batch": args.bp_every_batch,
        "repeats": args.repeats,
        "reference_slides_per_sec_cpu": round(ref_sps, 4),
        "reference_slides_per_sec_cpu_mad": round(ref_mad, 4),
        "reference_runs": [round(x, 4) for x in ref_runs],
        "ours_slides_per_sec_cpu": round(ours_sps, 3),
        "ours_slides_per_sec_cpu_mad": round(ours_mad, 4),
        "ours_runs": [round(x, 3) for x in ours_runs],
        "measured_cpu_ratio": round(ours_sps / ref_sps, 2),
        "measured_cpu_ratio_mad_range": [
            round((ours_sps - ours_mad) / (ref_sps + ref_mad), 2),
            round((ours_sps + ours_mad) / max(ref_sps - ref_mad, 1e-9), 2)],
        "measured_cpu_ratio_minmax_range": [
            round(min(ours_runs) / max(ref_runs), 2),
            round(max(ours_runs) / min(ref_runs), 2)],
        "reference_bags_timed": ref_bags,
        "note": ("same-host torch-CPU vs JAX-CPU measurement of identical "
                 "train-step semantics; anchors bench.py's analytic "
                 "reference-GPU estimate (SURVEY.md §6); headline ratio = "
                 "median/median over repeats, mad_range propagates the "
                 "median absolute deviations, minmax_range = worst/best "
                 "pairing"),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
