"""On-chip validation of the extraction tower's flash-attention path.

The ViT trunk routes self-attention through the fused Pallas flash kernel
only when running on TPU (`vision_tower._use_flash_attention`), so the
CPU-pinned test suite cannot exercise it.  This script runs on the real
chip and checks both halves of the claim:

  * numerics — flash vs dense outputs on the same bf16 tower agree to
    bf16 reordering tolerance (relative to the output scale),
  * performance — flash does not lose to dense XLA attention (guards
    against block-size regressions like the 128-everywhere default,
    which is ~1.7x SLOWER than dense at ViT lengths).

Writes EXTRACT_CHIP.json next to the repo root and exits non-zero on
either failure.  Timing note: over the axon tunnel `block_until_ready`
does not force execution — throughput is measured with a lax.scan of EN
forwards inside one jit, synced by consuming the output.

Usage: python scripts/validate_extraction_chip.py [--batch 64] [--scan 6]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan", type=int, default=6)
    ap.add_argument("--rtol", type=float, default=5e-3,
                    help="max |flash-dense| as a fraction of max|dense|")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vlsa_tpu.models.precision import cast_vision_tower_weights
    from vlsa_tpu.models.vision_tower import ConchVisualModel

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": f"backend={jax.default_backend()}"}))
        return 0

    vit = ConchVisualModel(image_size=448, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 3, 448, 448)).astype(np.float32))
    params = jax.jit(lambda k: vit.init(
        k, imgs[:1], method=ConchVisualModel.forward_no_head
    )["params"])(jax.random.PRNGKey(0))
    params = cast_vision_tower_weights(params)

    fwd = lambda p, x: vit.apply({"params": p}, x,
                                 method=ConchVisualModel.forward_no_head)

    # numerics: flash (default on tpu) vs dense (env-disabled, retraced)
    os.environ.pop("VLSA_TPU_DISABLE_PALLAS", None)
    flash_out = np.asarray(jax.jit(fwd)(params, imgs))
    os.environ["VLSA_TPU_DISABLE_PALLAS"] = "1"
    dense_out = np.asarray(jax.jit(lambda p, x: fwd(p, x))(params, imgs))
    scale = float(np.abs(dense_out).max())
    max_dev = float(np.abs(flash_out - dense_out).max())
    numerics_ok = max_dev <= args.rtol * scale

    # throughput: scan-of-EN forwards inside one jit, both attention paths
    def timed(disable: bool) -> float:
        if disable:
            os.environ["VLSA_TPU_DISABLE_PALLAS"] = "1"
        else:
            os.environ.pop("VLSA_TPU_DISABLE_PALLAS", None)
        big = jnp.asarray(rng.normal(
            size=(args.batch, 3, 448, 448)).astype(np.float32))

        def scan_fwd(p, x):
            def body(chain, _):
                out = fwd(p, x + chain * 1e-30)
                return out[0, 0], out
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.scan))
            return outs[-1]

        jfn = jax.jit(scan_fwd)
        _ = float(jfn(params, big).sum())  # warm/compile
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(jfn(params, big).sum())
            best = min(best, (time.perf_counter() - t0) / args.scan)
        return best

    t_flash = timed(False)
    t_dense = timed(True)
    perf_ok = t_flash <= t_dense * 1.02  # flash must not lose (2% noise)

    # bf16 residual stream (the extraction default for bf16 compute):
    # numerics vs the f32-residual flash tower + throughput A/B.
    os.environ.pop("VLSA_TPU_DISABLE_PALLAS", None)
    vit_r16 = ConchVisualModel(image_size=448, compute_dtype="bfloat16",
                               trunk_residual_dtype="bfloat16")
    fwd_r16 = lambda p, x: vit_r16.apply(
        {"params": p}, x, method=ConchVisualModel.forward_no_head)
    r16_out = np.asarray(jax.jit(fwd_r16)(params, imgs))
    r16_dev = float(np.abs(r16_out - flash_out).max())
    r16_numerics_ok = r16_dev <= 4 * args.rtol * scale

    big = jnp.asarray(rng.normal(
        size=(args.batch, 3, 448, 448)).astype(np.float32))

    def timed_fwd(fn) -> float:
        def scan_fwd(p, x):
            def body(chain, _):
                out = fn(p, x + chain * 1e-30)
                return out[0, 0], out
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.scan))
            return outs[-1]
        jfn = jax.jit(scan_fwd)
        _ = float(jfn(params, big).sum())
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(jfn(params, big).sum())
            best = min(best, (time.perf_counter() - t0) / args.scan)
        return best

    t_r16 = timed_fwd(fwd_r16)
    r16_perf_ok = t_r16 <= t_flash * 1.02  # must not lose to f32 residual

    # --- device-side preprocessing: the exactness contract on the REAL
    # chip (the CPU suite proves CPU-XLA only; TPU lowers integer dots
    # through float passes, which broke the original einsum form).  The
    # integer pipeline (tap-form fixed-point resize + crop) must be
    # BYTE-exact; the f32 normalize must match numpy to <= 1 ulp (~5e-7:
    # TPU rounds f32 division differently).  Plus an end-to-end A/B from
    # 512x512 u8 tiles vs the host-preprocess pipeline ---
    from vlsa_tpu.data.transforms import (center_crop, preprocess_batch,
                                          resize_shortest_edge)
    from vlsa_tpu.data.transforms_device import build_device_preprocess
    tiles = rng.integers(0, 256, (args.batch, 512, 512, 3), dtype=np.uint8)
    pre_dev_u8 = build_device_preprocess((512, 512), 448, normalize=False)
    got_u8 = np.asarray(jax.jit(pre_dev_u8)(jnp.asarray(tiles[:4])))
    want_u8 = np.stack(
        [center_crop(resize_shortest_edge(t, 448), 448) for t in tiles[:4]])
    pp_exact = bool(np.array_equal(got_u8, want_u8))
    pre_dev = build_device_preprocess((512, 512), 448)
    got = np.asarray(jax.jit(pre_dev)(jnp.asarray(tiles[:4])))
    want = preprocess_batch(list(tiles[:4]), 448)
    # two chained f32 roundings (x/255, then /std) can each differ by 1 ulp
    # (~2.4e-7 at the output scale); measured 4.8e-7 on chip
    norm_ulp_dev = float(np.abs(got - want).max())
    norm_ok = norm_ulp_dev <= 1e-6

    # host preprocess throughput (the 448-target resize of a 512 tile)
    _ = preprocess_batch(list(tiles[:8]), 448)  # warm numpy paths
    t0 = time.perf_counter()
    _ = preprocess_batch(list(tiles), 448)
    t_host_pre = (time.perf_counter() - t0)

    # fused u8->features program (preprocess + tower in ONE jit)
    def fused(p, x):
        return vit.apply({"params": p}, pre_dev(x),
                         method=ConchVisualModel.forward_no_head)

    def timed_u8(fn) -> float:
        xs = jnp.asarray(tiles)

        def scan_fwd(p, x):
            def body(chain, _):
                out = fn(p, jnp.bitwise_xor(x, chain))
                return out[0, 0].astype(jnp.uint8), out
            _, outs = jax.lax.scan(body, jnp.uint8(0),
                                   jnp.arange(args.scan))
            return outs[-1]
        jfn = jax.jit(scan_fwd)
        _ = float(jfn(params, xs).sum())
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(jfn(params, xs).sum())
            best = min(best, (time.perf_counter() - t0) / args.scan)
        return best

    t_fused = timed_u8(fused)
    # the production host path overlaps host preprocess with device compute
    # (async dispatch), so its steady-state bound is max(host_pre, forward)
    t_host_path = max(t_host_pre, t_flash)
    dp_ok = pp_exact and norm_ok and t_fused <= t_host_path * 1.05

    # --- w8a8 int8 trunk (opt-in lane) ---
    # exactness guard: the s8 x s8 -> s32 dot must accumulate exactly in
    # int32 ON CHIP (the analogous int32 dot does NOT — float-pass
    # lowering; same-sign operands push the accumulator past 2^24)
    xi = rng.integers(64, 128, size=(64, 3072), dtype=np.int8)
    wi = rng.integers(64, 128, size=(48, 3072), dtype=np.int8)
    got_i = np.asarray(jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32))(jnp.asarray(xi), jnp.asarray(wi)))
    want_i = xi.astype(np.int64) @ wi.astype(np.int64).T
    s8_exact = bool(np.array_equal(got_i, want_i.astype(np.int32)))

    from vlsa_tpu.models.precision import quantize_vision_tower_weights
    qparams = quantize_vision_tower_weights(
        jax.tree.map(lambda t: t.astype(jnp.float32)
                     if t.dtype == jnp.bfloat16 else t, params))
    qparams = cast_vision_tower_weights(qparams)
    vit_q8 = ConchVisualModel(image_size=448, compute_dtype="bfloat16",
                              trunk_quantized=True)
    fwd_q8 = lambda p, x: vit_q8.apply(
        {"params": p}, x, method=ConchVisualModel.forward_no_head)
    q8_out = np.asarray(jax.jit(fwd_q8)(qparams, imgs))
    # per-row cosine against the float tower (the CPU suite's bound)
    cos_rows = (q8_out * flash_out).sum(-1) / (
        np.linalg.norm(q8_out, axis=-1) * np.linalg.norm(flash_out, axis=-1))
    q8_numerics_ok = bool(cos_rows.min() > 0.99)

    def timed_q8() -> float:
        def scan_fwd(p, x):
            def body(chain, _):
                out = fwd_q8(p, x + chain * 1e-30)
                return out[0, 0], out
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.scan))
            return outs[-1]
        jfn = jax.jit(scan_fwd)
        _ = float(jfn(qparams, big).sum())
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(jfn(qparams, big).sum())
            best = min(best, (time.perf_counter() - t0) / args.scan)
        return best

    t_q8 = timed_q8()
    q8_ok = s8_exact and q8_numerics_ok

    result = {
        "numerics": {"max_abs_dev": max_dev, "out_scale": scale,
                     "rel_dev": max_dev / scale, "ok": numerics_ok},
        "throughput": {
            "flash_tiles_per_sec": round(args.batch / t_flash, 1),
            "dense_tiles_per_sec": round(args.batch / t_dense, 1),
            "flash_speedup": round(t_dense / t_flash, 3), "ok": perf_ok},
        "residual_bf16": {
            "rel_dev_vs_f32_residual": r16_dev / scale,
            "tiles_per_sec": round(args.batch / t_r16, 1),
            "speedup_vs_f32_residual": round(t_flash / t_r16, 3),
            "ok": r16_numerics_ok and r16_perf_ok},
        "int8_trunk": {
            "s8_dot_exact_on_chip": s8_exact,
            "min_cosine_vs_float_tower": float(cos_rows.min()),
            "tiles_per_sec": round(args.batch / t_q8, 1),
            "speedup_vs_bf16": round(t_flash / t_q8, 3),
            "ok": q8_ok},
        "device_preprocess": {
            "u8_pipeline_byte_exact_on_chip": pp_exact,
            "normalize_max_abs_dev": norm_ulp_dev,
            "host_preprocess_tiles_per_sec": round(args.batch / t_host_pre, 1),
            "fused_u8_tiles_per_sec": round(args.batch / t_fused, 1),
            "host_path_tiles_per_sec_overlap_bound":
                round(args.batch / t_host_path, 1),
            "e2e_speedup_vs_host_path": round(t_host_path / t_fused, 3),
            "ok": dp_ok},
        "batch": args.batch,
        "ok": (numerics_ok and perf_ok and r16_numerics_ok and r16_perf_ok
               and dp_ok and q8_ok),
    }
    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "EXTRACT_CHIP.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
