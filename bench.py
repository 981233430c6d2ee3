"""Benchmark: slides/sec for the flagship VLSA model at 10k-patch bags.

Protocol (matches BASELINE.json's driver metric): each processed slide goes
through one full *training* step (forward incl. the CONCH-size text tower,
all losses, backward, optimizer update) AND one inference forward; the metric
is slides / (t_train + t_infer) per batch, jitted, steady-state, on whatever
backend is available (real TPU chip under the driver).

DEADLINE SAFETY (round-4, after BENCH_r03 rc=124): the headline JSON line is
printed AND flushed immediately after the headline train/infer timings — a
driver timeout later can no longer erase the round's number.  Every optional
lane (secondary storage lane, precomputed-text eval, extraction x3,
interpretation) is gated on a wall-clock budget (VLSA_TPU_BENCH_BUDGET_S,
default 480 s) and the full JSON is re-printed after each lane completes, so
the LAST line is always the most complete result and every printed line
carries the same metric/value/vs_baseline headline fields.

Reference denominator (vs_baseline): the upstream repo publishes no
throughput numbers (ref README.md — hardware only).  The headline ratio is
the MEASURED same-host CPU-vs-CPU ratio (scripts/measure_reference.py runs
the actual reference train-step semantics and ours on the same silicon,
BASELINE_MEASURED.json); the analytic estimate of the reference on its own
2x RTX 3090 stays as secondary context:
  * per-bag cost is dominated by the text tower: the reference re-runs the
    12-layer/768-wide CONCH tower forward AND backward for every bag
    (ref model/vlsa.py:181-198 calls forward_text_only inside every net(X);
    batch_size=1, bp_every_batch=32 sequential bags per update,
    ref runner/vlsa_handler.py:260-289),
  * 12 prompts x 128 tokens x ~85M tower params ~= 261 GFLOP forward,
    ~783 GFLOP with backward, + per-bag HtoD copies and Python dispatch,
  * one 3090 at a generous 25% fp32 utilisation (8.9 TFLOP/s effective)
    => ~88 ms/bag => ~11 slides/sec; we round UP to 12.0 slides/sec to keep
    the reported ratio conservative.
Our design amortises the text tower over the whole batch (identical
gradients — the per-bag text forwards in the reference are over identical
parameters), which is where most of the speedup comes from; the rest is the
fused co-attention kernel + batched MXU-friendly shapes.

When the run config differs from the default one (B=1024 — the measured
B-sweep knee, docs/PERF.md round 4 — N=10240, full tower), vs_baseline is
null: sweep outputs must not be read as baseline comparisons.  The measured
CPU-vs-CPU ratio itself is B-independent (it compares identical train-step
semantics at the reference's bp_every_batch=32 — BASELINE_MEASURED.json).
"""
from __future__ import annotations

import functools
import json
import os as _os
import sys
import time

import numpy as np

REFERENCE_SLIDES_PER_SEC = 12.0  # analytic estimate, see module docstring

_T0 = time.monotonic()
# total wall-clock budget for the WHOLE script; optional lanes degrade to
# "skipped" notes rather than risking the driver's external timeout (rc 124)
BUDGET_S = float(_os.environ.get("VLSA_TPU_BENCH_BUDGET_S", "480"))

# Defaults = the measured-best configuration (docs/PERF.md round-4 B-sweep
# + round-5 tile bump, BSWEEP.json): B=1024 is the throughput knee (41.1k
# slides/s int8 at the round-5 5120 tile; 512→1024 is +8.5% but 1024→2048
# only +4% for 2x the memory and step latency — and B=2048 leaves no HBM
# for the bf16 secondary lane).  int8 feature storage
# halves the HBM stream and carries task-level accuracy evidence
# (INT8_ACCURACY.json, multi-seed, both loss families).  The bf16
# near-reference-numerics lane is measured alongside every run when the
# budget allows (`bf16_lane` detail block).
B = int(_os.environ.get("VLSA_TPU_BENCH_B", 1024))
# Bag length is parameterizable for long-context datapoints (e.g. a 100k-patch
# whole-slide bag: VLSA_TPU_BENCH_B=8 VLSA_TPU_BENCH_N=102400) — the streaming
# co-attention kernels are O(N) in HBM and never materialize [B, N, P].
N = int(_os.environ.get("VLSA_TPU_BENCH_N", 10240))
D, K = 512, 12


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _note(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {msg}",
          file=sys.stderr, flush=True)


_FULL_RECORD_PATH = _os.environ.get(
    "VLSA_TPU_BENCH_FULL_PATH",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                  "BENCH_FULL_LAST.json"))

# stdout line-length contract: the driver captures only the LAST ~2000
# characters of stdout, so every line printed to stdout must stay well
# under that.  BENCH_r04 was lost because the final line re-emitted the
# entire ever-growing record (>2000 chars) and the truncation cut off the
# headline fields at the FRONT of the line (VERDICT r4 #1).
_MAX_LINE = 1400

# compact-detail keys, in priority order; dropped from the END if the
# line would exceed _MAX_LINE (defensive — in practice it never does)
_COMPACT_DETAIL_KEYS = (
    "train_step_ms", "infer_step_ms", "batch_bags", "patches_per_bag",
    "backend", "feats_dtype", "tower_compute_dtype",
    "measured_cpu_ratio", "measured_cpu_ratio_minmax_range",
    "lanes_completed", "bf16_lane_slides_per_sec",
    "int8_lane_slides_per_sec",
    "infer_step_precomputed_text_ms", "extract_tiles_per_sec",
    "interp_patients_per_sec",
)


def _compact_line(result: dict) -> str:
    """Build the driver-parseable stdout line: headline fields + a flat,
    bounded detail summary.  Guaranteed <= _MAX_LINE chars."""
    d = result.get("detail", {})
    lanes = [k for k in ("infer_precomputed_text" if
                         "infer_step_precomputed_text_ms" in d else None,
                         "bf16_lane" if isinstance(d.get("bf16_lane"), dict)
                         and "slides_per_sec" in d.get("bf16_lane", {}) else None,
                         "int8_opt_in" if isinstance(d.get("int8_opt_in"), dict)
                         and "slides_per_sec" in d.get("int8_opt_in", {}) else None,
                         "feature_extraction" if isinstance(
                             d.get("feature_extraction"), dict)
                         and "tiles_per_sec" in d.get("feature_extraction", {})
                         else None,
                         "interpretation" if isinstance(
                             d.get("interpretation"), dict)
                         and "patients_per_sec" in d.get("interpretation", {})
                         else None,
                         "kernels_chip" if isinstance(d.get("kernels_chip"),
                                                      dict)
                         and d.get("kernels_chip", {}).get("ok") else None)
             if k]
    mref = d.get("measured_reference_cpu") or {}
    flat = {
        "train_step_ms": d.get("train_step_ms"),
        "infer_step_ms": d.get("infer_step_ms"),
        "batch_bags": d.get("batch_bags"),
        "patches_per_bag": d.get("patches_per_bag"),
        "backend": d.get("backend"),
        "feats_dtype": d.get("feats_dtype"),
        "tower_compute_dtype": d.get("tower_compute_dtype"),
        "measured_cpu_ratio": mref.get("measured_cpu_ratio"),
        "measured_cpu_ratio_minmax_range": mref.get("minmax_range"),
        "lanes_completed": lanes,
        "bf16_lane_slides_per_sec": (d.get("bf16_lane") or {}).get(
            "slides_per_sec"),
        "int8_lane_slides_per_sec": (d.get("int8_opt_in") or {}).get(
            "slides_per_sec"),
        "infer_step_precomputed_text_ms": d.get(
            "infer_step_precomputed_text_ms"),
        "extract_tiles_per_sec": (d.get("feature_extraction") or {}).get(
            "tiles_per_sec"),
        "interp_patients_per_sec": (d.get("interpretation") or {}).get(
            "patients_per_sec"),
    }
    compact = {
        "bench_schema_version": 2,
        "metric": result.get("metric"),
        "value": result.get("value"),
        "unit": result.get("unit"),
        "vs_baseline": result.get("vs_baseline"),
        "note": result.get("note"),
        "detail": {k: flat.get(k) for k in _COMPACT_DETAIL_KEYS
                   if flat.get(k) is not None},
        "full_record": _os.path.basename(_FULL_RECORD_PATH),
    }
    if compact["note"] is None:
        compact.pop("note")
    line = json.dumps(compact)
    for k in reversed(_COMPACT_DETAIL_KEYS):   # defensive shrink
        if len(line) <= _MAX_LINE:
            break
        compact["detail"].pop(k, None)
        line = json.dumps(compact)
    return line


def _emit(result: dict) -> None:
    """Emit the (possibly updated) result.  stdout gets ONLY the compact
    driver-parseable headline line (<= _MAX_LINE chars, so the driver's
    last-2000-char tail capture always contains it whole); the FULL record
    goes to BENCH_FULL_LAST.json and stderr.  Flushed so a later kill
    cannot erase it."""
    try:
        with open(_FULL_RECORD_PATH, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    print("[bench full record] " + json.dumps(result),
          file=sys.stderr, flush=True)
    print(_compact_line(result), flush=True)


def _gen_feats_device(B, N, D, feats_dtype):
    """Generate the synthetic bench features ON DEVICE (jax.random), in
    B-chunks so the f32 intermediate stays under ~3 GB of HBM.

    The round-4 B-sweep's B>=1024 points timed out in HOST-side numpy
    generation (a 21.5 GB f32 array takes minutes on a 1-CPU box), walling
    the sweep before the device ever ran (BSWEEP.json).  Device generation
    removes that wall; the per-chunk fold keys make it deterministic, and
    both storage lanes derive from the SAME underlying f32 draws.

    Returns (feats, x_scale, x_inv) — scale/inv are None unless int8.
    """
    import jax
    import jax.numpy as jnp

    chunk = B
    while chunk * N * D * 4 > 3e9 and chunk % 2 == 0:
        chunk //= 2

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, N, D), jnp.float32)
        if feats_dtype == "int8":
            # device twin of data/pipeline.py::quantize_feats_int8 +
            # feats_inv_norms (per-patch symmetric scale, 1/l2norm sidecar)
            scale = jnp.abs(x).max(-1) / 127.0
            safe = jnp.where(scale > 0, scale, 1.0)
            q = jnp.clip(jnp.rint(x / safe[..., None]), -127, 127
                         ).astype(jnp.int8)
            qf = q.astype(jnp.float32)
            sq = jnp.einsum("bnd,bnd->bn", qf, qf)
            inv = jnp.where(sq > 0, jax.lax.rsqrt(sq), 0.0)
            return q, scale, inv
        if feats_dtype == "bfloat16":
            return (x.astype(jnp.bfloat16),)
        return (x,)

    # donated dynamic_update_slice => in-place chunk writes: peak HBM is
    # the full store + one f32 chunk, never 2x the store (a concatenate
    # would copy — at B=1024 bf16 that alone is 21 GB)
    upd = jax.jit(
        lambda buf, c, i: jax.lax.dynamic_update_slice(
            buf, c, (i,) + (jnp.int32(0),) * (c.ndim - 1)),
        donate_argnums=(0,))

    key0 = jax.random.PRNGKey(1234)
    bufs = None
    for ci in range(0, B, chunk):
        outs = gen_chunk(jax.random.fold_in(key0, ci))
        if bufs is None:
            if chunk == B:
                bufs = list(outs)
                break
            bufs = [jnp.zeros((B,) + o.shape[1:], o.dtype) for o in outs]
        bufs = [upd(b, o, jnp.int32(ci)) for b, o in zip(bufs, outs)]
    jax.block_until_ready(bufs)
    if feats_dtype == "int8":
        return bufs[0], bufs[1], bufs[2]
    return bufs[0], None, None


def main():
    global B
    # FIRST statement: a provisional, parseable headline line (value null).
    # A kill at ANY later point — including minutes of cold-cache compile
    # silence — leaves the driver a valid final line instead of an empty or
    # truncated tail (VERDICT r4 #2; BENCH_r03 rc=124 had an empty tail).
    print(json.dumps({
        "bench_schema_version": 2,
        "metric": f"slides/sec at {N / 1024:g}k-patch bags (train+infer step)",
        "value": None, "unit": "slides/sec", "vs_baseline": None,
        "note": "provisional — building/compiling; a complete record "
                "replaces this line",
    }), flush=True)

    # degrade path: if the wall-clock budget cannot plausibly cover the
    # full flagship compile + warm at the default B, drop to B=256 (a
    # fraction of B=1024's compile and HBM) rather than risk rc=124.
    # Only the DEFAULT B degrades — an explicit VLSA_TPU_BENCH_B pin wins.
    FLAGSHIP_EST_S = 300.0
    degraded_b = None
    if (_os.environ.get("VLSA_TPU_BENCH_B") is None and B == 1024
            and _remaining() < FLAGSHIP_EST_S):
        degraded_b, B = B, 256
        _note(f"budget {_remaining():.0f}s < {FLAGSHIP_EST_S:.0f}s flagship "
              f"estimate: degrading B {degraded_b} -> {B}")

    import jax
    # Honor an explicit JAX_PLATFORMS pin.  The environment may register a
    # TPU plugin at interpreter start (sitecustomize) that selects
    # "axon,cpu" REGARDLESS of the env var — a CPU-pinned run (the CI smoke
    # test, tests/test_bench_smoke.py) would otherwise silently go over the
    # TPU tunnel and time out in remote compiles.  Same failure mode the
    # extraction CLI hit (scripts/extract_features.py --platform).
    _plat = _os.environ.get("JAX_PLATFORMS")
    if _plat:
        jax.config.update("jax_platforms", _plat)
    # persistent compilation cache: repeated bench runs (e.g. the driver's)
    # skip the multi-minute remote TPU compile (machine-fingerprinted when
    # benching on a CPU host — see vlsa_tpu/compile_cache.py)
    from vlsa_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import optax

    import os
    from __graft_entry__ import _build_flagship
    from vlsa_tpu.losses import surv_emd, surv_ifmle
    from vlsa_tpu.optim import create_optimizer

    dtype = os.environ.get("VLSA_TPU_BENCH_DTYPE", "bfloat16")
    # VLSA_TPU_BENCH_SMALL=1 swaps in the 2-layer test tower — CI smoke only
    # (tests/test_bench_smoke.py); the driver's headline runs keep small=0
    small = os.environ.get("VLSA_TPU_BENCH_SMALL", "0") == "1"
    _note(f"build flagship (small={small}, dtype={dtype}, B={B}, N={N})")
    model, params = _build_flagship(small=small, tower_dtype=dtype)
    # production semantics: the text tower is frozen during VLSA training
    # (ref runner/vlsa_handler.py:126-149) — no grads, no moments for it
    frozen_tower = _os.environ.get("VLSA_TPU_BENCH_FROZEN_TOWER", "1") == "1"
    frozen = jax.tree.map(lambda _: False, dict(params))
    if frozen_tower:
        frozen["prompt_encoder"] = jax.tree.map(
            lambda _: True, dict(params)["prompt_encoder"])
        if dtype == "bfloat16":
            # store the frozen tower's matmul weights in bf16 once — exactly
            # the rounding the tower applies per step anyway (docs/PERF.md)
            from vlsa_tpu.models.precision import cast_frozen_tower_weights
            params = cast_frozen_tower_weights(params)
    tx = create_optimizer("adam", 2e-4, 1e-5, params, frozen=frozen)
    opt_state = tx.init(params)

    def train_step(params, opt_state, feats, mask, t, e, rng, x_scale=None,
                   x_inv=None):
        def loss_fn(p):
            if frozen_tower:
                p = dict(p, prompt_encoder=jax.lax.stop_gradient(p["prompt_encoder"]))
            logits, _i, _t = model.apply({"params": p}, feats, mask,
                                         train=True, rngs={"dropout": rng},
                                         x_scale=x_scale, x_inv=x_inv)
            probs = jax.nn.softmax(logits, axis=-1)
            ls = jnp.exp(p["logit_scale"])
            return (surv_ifmle(probs, t, e)
                    + surv_emd(probs, t, e, ls))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def infer_step(params, feats, mask, chain, x_scale=None, x_inv=None):
        # `chain` threads the previous output back in so successive timed
        # calls are data-dependent (the remote runtime dedupes identical
        # in-flight executions); added to the OUTPUT so no input copy occurs
        logits, _i, _t = model.apply({"params": params}, feats, mask,
                                     x_scale=x_scale, x_inv=x_inv)
        return logits + chain * 1e-30

    # scanned variants: N steps inside ONE compiled program.  This measures
    # true device throughput with a single dispatch — the per-call dispatch
    # latency of a remote/tunnelled runtime would otherwise dominate, and
    # production training loops run device-resident exactly like this.
    # These are the ONLY two programs compiled before the headline prints.
    def train_scan(params, opt_state, feats, mask, t, e, key, n, x_scale=None,
                   x_inv=None):
        def body(carry, i):
            p, o = carry
            p, o, loss = train_step(p, o, feats, mask, t, e,
                                    jax.random.fold_in(key, i), x_scale, x_inv)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n))
        return params, opt_state, losses[-1]

    def infer_scan(params, feats, mask, n, x_scale=None, x_inv=None):
        # the chain must reach EVERY model input that feeds compute — the
        # prompt embeddings (text tower) AND the query adapter (co-attention
        # queries).  Perturbing only the prompt embeddings leaves the
        # co-attention loop-invariant and XLA hoists it out of the scan,
        # silently measuring the text tower alone.
        def body(chain, _):
            p = dict(params)
            pl_tree = dict(p["prompt_learner"])
            pl_tree["context_embeds"] = (
                pl_tree["context_embeds"] + chain * 1e-30)
            p["prompt_learner"] = pl_tree
            if "query_adapter" in p:
                qa = dict(p["query_adapter"])
                qa["residual_features"] = qa["residual_features"] + chain * 1e-30
                p["query_adapter"] = qa
            out = infer_step(p, feats, mask, jnp.float32(0.0), x_scale, x_inv)
            return out[0, 0], out
        chain, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return outs[-1]

    # 100 steps per dispatch: the tunnelled runtime costs ~30 ms per dispatch
    # (launch + scalar fetch RTT), which at 20 steps inflated every per-step
    # number by ~1.5 ms.  Device-side truth (trace, docs/PERF.md): train
    # 4.99 ms / infer 2.58 ms per step inside the scan.
    SCAN_N = int(_os.environ.get("VLSA_TPU_BENCH_SCAN_N", "100"))
    train_scan_jit = jax.jit(functools.partial(train_scan, n=SCAN_N),
                             donate_argnums=(0, 1))
    infer_scan_jit = jax.jit(functools.partial(infer_scan, n=SCAN_N))

    rng = np.random.default_rng(0)
    feats_dtype = _os.environ.get("VLSA_TPU_BENCH_FEATS_DTYPE", "int8")
    _note(f"generate features on device "
          f"({B * N * D * 4 / 1e9:.1f} GB f32 equivalent)")
    feats, x_scale, x_inv = _gen_feats_device(B, N, D, feats_dtype)
    mask = jnp.ones((B, N), bool)
    t = jnp.asarray(rng.integers(0, K, size=B), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=B), jnp.float32)
    key = jax.random.PRNGKey(0)

    # warm / compile the two headline programs.  NOTE: jax.block_until_ready
    # can return before the remote device has finished under the tunnelled
    # runtime, so every timing below forces a scalar host transfer instead.
    _note("compile+warm train scan")
    params, opt_state, loss = train_scan_jit(params, opt_state, feats, mask,
                                             t, e, key, x_scale=x_scale, x_inv=x_inv)
    _ = float(loss)
    _note("compile+warm infer scan")
    _ = float(infer_scan_jit(params, feats, mask, x_scale=x_scale, x_inv=x_inv).sum())

    profile_dir = _os.environ.get("VLSA_TPU_BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # best-of-3: single one-way tunnel stalls otherwise pollute the number
    # (round 5 observed a 10.74 ms infer read vs 8.2-8.3 ms on every
    # neighbouring run at identical config; ~2.5 s per extra rep is cheap)
    t_train = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = train_scan_jit(params, opt_state, feats,
                                                 mask, t, e, key,
                                                 x_scale=x_scale,
                                                 x_inv=x_inv)
        _ = float(loss)   # forces completion of all SCAN_N chained steps
        t_train = min(t_train, (time.perf_counter() - t0) / SCAN_N)

    t_infer = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        out = infer_scan_jit(params, feats, mask, x_scale=x_scale, x_inv=x_inv)
        _ = float(out.sum())
        t_infer = min(t_infer, (time.perf_counter() - t0) / SCAN_N)

    if profile_dir:
        jax.profiler.stop_trace()
        _note(f"profile trace written to {profile_dir}")

    # --- analytic roofline accounting (VERDICT r1 weak#2: report achieved
    # GB/s + FLOP/s so perf regressions are visible) ---
    n_tower_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(dict(params)["prompt_encoder"]))
    P_q = 12
    trim = model.text_trim_len or 128
    feats_bytes = {"bfloat16": 2, "int8": 1}.get(feats_dtype, 4)
    # coattn: fwd (logits + PV) + dQ-only bwd; tower: fwd + dgrad through
    # activations (weights frozen -> no wgrad); adapters negligible
    flops_train = (8 * B * N * D * P_q + 3 * B * N * D
                   + (0 if frozen_tower else 2) * 4 * n_tower_params * P_q * trim
                   + 4 * n_tower_params * P_q * trim)
    flops_infer = 4 * B * N * D * P_q + 3 * B * N * D + 2 * n_tower_params * P_q * trim
    # HBM: the patch features dominate; read once fwd + once bwd per train
    # step, once per infer step (dX never written: x_stop_gradient path)
    hbm_train = 2 * B * N * D * feats_bytes
    hbm_infer = 1 * B * N * D * feats_bytes
    V5E_PEAK_TFLOPS, V5E_HBM_GBPS = 197.0, 819.0
    perf = {
        "train_achieved_tflops": round(flops_train / t_train / 1e12, 2),
        "train_achieved_hbm_gbps": round(hbm_train / t_train / 1e9, 1),
        "train_mfu_pct": round(100 * flops_train / t_train / 1e12 / V5E_PEAK_TFLOPS, 2),
        "train_hbm_util_pct": round(100 * hbm_train / t_train / 1e9 / V5E_HBM_GBPS, 1),
        "infer_achieved_hbm_gbps": round(hbm_infer / t_infer / 1e9, 1),
        "infer_hbm_util_pct": round(100 * hbm_infer / t_infer / 1e9 / V5E_HBM_GBPS, 1),
        "note": "analytic flop/byte model (coattn + frozen tower), v5e peaks "
                f"{V5E_PEAK_TFLOPS} TFLOP/s bf16 / {V5E_HBM_GBPS} GB/s",
    }

    # measured same-host CPU-vs-CPU reference ratio (scripts/measure_reference.py)
    measured = None
    mpath = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "BASELINE_MEASURED.json")
    if _os.path.exists(mpath):
        with open(mpath) as f:
            measured = json.load(f)

    slides_per_sec = B / (t_train + t_infer)
    # Headline ratio (VERDICT r2 weak#2): lead with the MEASURED same-host
    # CPU-vs-CPU ratio (scripts/measure_reference.py runs the actual
    # reference loop and ours on the same silicon; the ratio compares
    # identical train-step semantics at the reference's bp_every_batch=32,
    # so it is independent of this script's B); the analytic reference-
    # on-3090 estimate stays as secondary context.  Only the default config
    # (B=1024 — the measured B-sweep knee — N=10240, full tower) reports the
    # ratio; a sweep run at any other config gets vs_baseline=null
    # (ADVICE r3 #1).
    is_baseline_cfg = (N == 10240 and B == 1024 and not small)
    vs_analytic = round(slides_per_sec / REFERENCE_SLIDES_PER_SEC, 2)
    vs_measured = (measured or {}).get("measured_cpu_ratio")
    if is_baseline_cfg:
        vs_baseline = vs_measured if vs_measured is not None else vs_analytic
        vs_basis = (
            "measured same-host CPU-vs-CPU ratio (identical train-step "
            "semantics, scripts/measure_reference.py)" if vs_measured is not None
            else "analytic reference-on-3090 estimate")
    else:
        vs_baseline = None
        vs_basis = (f"config (B={B}, N={N}, small={small}) differs from the "
                    "default one (B=1024, N=10240, full tower) — "
                    "no comparable baseline ratio")
    result = {
        "metric": f"slides/sec at {N / 1024:g}k-patch bags (train+infer step)",
        "value": round(slides_per_sec, 2),
        "unit": "slides/sec",
        "vs_baseline": vs_baseline,
        "vs_baseline_basis": vs_basis,
        "vs_baseline_analytic_3090": vs_analytic if is_baseline_cfg else None,
        "detail": {
            "train_step_ms": round(t_train * 1e3, 2),
            "infer_step_ms": round(t_infer * 1e3, 2),
            "batch_bags": B,
            "patches_per_bag": N,
            "backend": jax.default_backend(),
            "tower_compute_dtype": dtype,
            "feats_dtype": feats_dtype,
            "frozen_text_tower": frozen_tower,
            "reference_estimate_slides_per_sec": REFERENCE_SLIDES_PER_SEC,
            "roofline": perf,
        },
    }
    if measured is not None:
        result["detail"]["measured_reference_cpu"] = {
            "reference_slides_per_sec_cpu": measured["reference_slides_per_sec_cpu"],
            "ours_slides_per_sec_cpu": measured["ours_slides_per_sec_cpu"],
            "measured_cpu_ratio": measured["measured_cpu_ratio"],
            # run-to-run spread disclosure (ADVICE r4 #2): ours_runs spans
            # 3.2-11.8 slides/s, so the worst/best pairing range must ride
            # along with the headline ratio, not only the MAD range
            "minmax_range": measured.get("measured_cpu_ratio_minmax_range"),
            "mad_range": measured.get("measured_cpu_ratio_mad_range"),
            "host": measured.get("host"),
        }
    if degraded_b is not None:
        result["detail"]["degraded_from_b"] = degraded_b
        result["vs_baseline"] = None
        result["vs_baseline_basis"] = (
            f"degraded to B={B} under budget (default B={degraded_b}) — "
            "no comparable baseline ratio")

    # ======= THE HEADLINE IS SAFE FROM HERE ON =======
    _note(f"headline: {slides_per_sec:.1f} slides/s "
          f"(train {t_train * 1e3:.2f} ms, infer {t_infer * 1e3:.2f} ms)")
    _emit(result)

    # task-level int8 accuracy evidence (scripts/validate_int8.py):
    # production-runner A/B of f32 vs q8npz stores on synthetic cohorts
    # with real prognostic signal (multi-seed, both loss families)
    int8_accuracy = None
    apath = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "INT8_ACCURACY.json")
    if _os.path.exists(apath):
        with open(apath) as f:
            _acc = json.load(f)
        int8_accuracy = {k: _acc[k] for k in
                         ("sa_abmil", "vlsa", "cohort", "spread", "cells",
                          "runs", "summary")
                         if k in _acc}
    if int8_accuracy is not None and feats_dtype == "int8":
        result["detail"]["int8_task_accuracy"] = int8_accuracy

    # --- optional lanes, in decreasing evidence value; each one is budget-
    # gated (estimated cost = compiles + timed runs) and exception-isolated,
    # and the full JSON is re-emitted after each completes ---

    def lane(name: str, est_s: float, enabled: bool, fn) -> None:
        if not enabled:
            return
        if _remaining() < est_s:
            result["detail"][name] = {
                "skipped": f"budget ({_remaining():.0f}s left < {est_s:.0f}s est)"}
            _note(f"lane {name}: skipped (budget)")
            _emit(result)
            return
        _note(f"lane {name}: start ({_remaining():.0f}s left)")
        try:
            detail = fn()
        except Exception as exc:  # never let a lane kill the record
            detail = {"error": f"{type(exc).__name__}: {exc}"}
        if detail is not None:
            result["detail"][name] = detail
            _emit(result)

    # production-eval variant: the runner's test_model precomputes the text
    # branch once per eval pass (engine.text_precompute) — measure the
    # resulting per-batch step as a detail (headline keeps the conservative
    # per-step re-encode protocol, matching the reference's semantics).
    # Runs BEFORE the other-storage lane: it is the last consumer of the
    # headline feature store, which the other lane frees to fit its own
    # store in HBM (at B=1024 the int8 headline 5.4 GB + bf16 lane 10.7 GB
    # + the generator's f32 chunk would exceed the chip's 16 GB).
    def run_infer_pre():
        def infer_pre_scan(params, feats, mask, tf, q, n):
            def body(chain, _):
                out, _i, _t = model.apply(
                    {"params": params}, feats, mask,
                    text_features=tf + chain * 1e-30,
                    query=None if q is None else q + chain * 1e-30,
                    x_scale=x_scale, x_inv=x_inv)
                return out[0, 0], out
            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs[-1]

        tf_pre, q_pre = jax.jit(
            lambda p: model.apply({"params": p}, method=model.text_precompute))(params)
        infer_pre_jit = jax.jit(functools.partial(infer_pre_scan, n=SCAN_N))
        _ = float(infer_pre_jit(params, feats, mask, tf_pre, q_pre).sum())
        t_pre = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            out = infer_pre_jit(params, feats, mask, tf_pre, q_pre)
            _ = float(out.sum())
            t_pre = min(t_pre, (time.perf_counter() - t0) / SCAN_N)
        result["detail"]["infer_step_precomputed_text_ms"] = round(t_pre * 1e3, 2)
        return None  # wrote directly into detail

    lane("infer_precomputed_text", est_s=75.0,
         enabled=_os.environ.get("VLSA_TPU_BENCH_PRE", "1") == "1",
         fn=run_infer_pre)
    if "infer_step_precomputed_text_ms" in result["detail"]:
        _emit(result)

    # --- the OTHER storage lane: the int8 headline (default) pairs with the
    # bf16 near-reference-numerics lane; a bf16 headline run pairs with the
    # int8 lane.  Reuses the same jitted scans (new dtype => recompile;
    # programs land in the persistent compile cache) ---
    other_name = "bf16_lane" if feats_dtype == "int8" else "int8_opt_in"

    def run_other_lane():
        nonlocal params, opt_state, feats, x_scale, x_inv
        # free the headline store first (its last consumer, the precomputed-
        # text lane, already ran): at B=1024 headline int8 (5.4 GB) + bf16
        # lane (10.7 GB) + the generator's f32 chunk cannot coexist in HBM
        feats = x_scale = x_inv = None
        # device generation from the SAME per-chunk fold keys as the
        # headline store — both lanes quantize/cast identical f32 draws
        other_dtype = "bfloat16" if feats_dtype == "int8" else "int8"
        feats_o, xs_o, xi_o = _gen_feats_device(B, N, D, other_dtype)
        if other_dtype == "bfloat16":
            note = ("feats_dtype: bfloat16 (near-reference numerics; "
                    "f32 storage reproduces the reference exactly)")
        else:
            note = ("feats_dtype: int8 (per-patch quantized storage, "
                    "native int8 MXU kernels + precomputed inv norms)")
        params2, opt_state2, loss = train_scan_jit(
            params, opt_state, feats_o, mask, t, e, key, x_scale=xs_o,
            x_inv=xi_o)
        params, opt_state = params2, opt_state2
        _ = float(loss)
        _ = float(infer_scan_jit(params, feats_o, mask, x_scale=xs_o,
                                 x_inv=xi_o).sum())
        t_tr8 = t_in8 = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            params2, opt_state2, loss = train_scan_jit(
                params, opt_state, feats_o, mask, t, e, key,
                x_scale=xs_o, x_inv=xi_o)
            params, opt_state = params2, opt_state2
            _ = float(loss)
            t_tr8 = min(t_tr8, (time.perf_counter() - t0) / SCAN_N)
        for _rep in range(2):
            t0 = time.perf_counter()
            out = infer_scan_jit(params, feats_o, mask, x_scale=xs_o,
                                 x_inv=xi_o)
            _ = float(out.sum())
            t_in8 = min(t_in8, (time.perf_counter() - t0) / SCAN_N)
        detail = {
            "train_step_ms": round(t_tr8 * 1e3, 2),
            "infer_step_ms": round(t_in8 * 1e3, 2),
            "slides_per_sec": round(B / (t_tr8 + t_in8), 2),
            "note": note,
        }
        if int8_accuracy is not None and feats_dtype != "int8":
            detail["task_accuracy"] = int8_accuracy
        return detail

    # generation is on-device now (seconds, not the 1-CPU host's minutes);
    # the est is dominated by the other-dtype scans' fresh compile
    lane(other_name, est_s=150.0,
         enabled=(jax.default_backend() == "tpu"
                  and feats_dtype in ("int8", "bfloat16")
                  and _os.environ.get(
                      "VLSA_TPU_BENCH_OTHER_LANE",
                      _os.environ.get("VLSA_TPU_BENCH_INT8", "1")) == "1"),
         fn=run_other_lane)

    # --- patch->feature extraction throughput (tiles/sec through the full
    # CONCH ViT-B/16 tower at 448x448, forward_no_head — BASELINE config 5's
    # end-to-end preprocessing path).  Random weights: throughput is
    # weight-independent ---
    def run_extract():
        from vlsa_tpu.models.vision_tower import ConchVisualModel
        EB = int(_os.environ.get("VLSA_TPU_BENCH_EXTRACT_B", "64"))
        EN = 10  # scan length per dispatch
        vit = ConchVisualModel(image_size=448, compute_dtype="bfloat16")
        imgs0 = jnp.asarray(
            np.random.default_rng(0).normal(size=(EB, 3, 448, 448))
            .astype(np.float32))
        vparams = jax.jit(lambda k: vit.init(
            k, imgs0[:1], method=ConchVisualModel.forward_no_head
        )["params"])(jax.random.PRNGKey(0))
        # production extractor path: frozen weights pre-cast to bf16
        from vlsa_tpu.models.precision import cast_vision_tower_weights
        vparams = cast_vision_tower_weights(vparams)

        # the production lane: raw 512x512 u8 tiles -> on-device
        # preprocessing (PIL-exact tap resize) fused with the tower
        # forward in one program (device_preprocess, the extractor
        # default on TPU — host preprocessing runs ~0.7 tiles/s on a
        # weak host, EXTRACT_CHIP.json)
        from vlsa_tpu.data.transforms_device import build_device_preprocess
        pre_dev = build_device_preprocess((512, 512), 448)
        tiles_u8 = jnp.asarray(np.random.default_rng(1).integers(
            0, 256, (EB, 512, 512, 3), dtype=np.uint8))

        def extract_u8_scan(p, xs):
            def body(chain, _):
                out = vit.apply({"params": p},
                                pre_dev(jnp.bitwise_xor(xs, chain)),
                                method=ConchVisualModel.forward_no_head)
                return out[0, 0].astype(jnp.uint8), out
            _, outs = jax.lax.scan(body, jnp.uint8(0), jnp.arange(EN))
            return outs[-1]

        extract_u8_jit = jax.jit(extract_u8_scan)
        _ = float(extract_u8_jit(vparams, tiles_u8).sum())   # warm
        t_u8 = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(extract_u8_jit(vparams, tiles_u8).sum())
            t_u8 = min(t_u8, (time.perf_counter() - t0) / EN)

        detail = {
            "tiles_per_sec": round(EB / t_u8, 1),
            "batch_tiles": EB,
            "step_ms": round(t_u8 * 1e3, 2),
            "note": "raw 512x512 u8 tiles -> on-device PIL-exact "
                    "preprocessing fused with the CONCH ViT-B/16 "
                    "448x448 forward_no_head, bf16 compute (the "
                    "extractor's TPU default); tower_only excludes "
                    "preprocessing",
        }

        # tower-only variant (excludes preprocessing) — own budget gate
        if _remaining() > 60.0:
            def extract_scan(p, imgs):
                def body(chain, _):
                    out = vit.apply({"params": p}, imgs + chain * 1e-30,
                                    method=ConchVisualModel.forward_no_head)
                    return out[0, 0], out
                _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(EN))
                return outs[-1]

            extract_jit = jax.jit(extract_scan)
            _ = float(extract_jit(vparams, imgs0).sum())   # warm
            t_ex = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                _ = float(extract_jit(vparams, imgs0).sum())
                t_ex = min(t_ex, (time.perf_counter() - t0) / EN)
            detail["tower_only_tiles_per_sec"] = round(EB / t_ex, 1)

        # opt-in w8a8 int8 trunk lane (docs/PERF.md round-3 item 6):
        # fused u8 pipeline with the quantized linears — the number the
        # --trunk_quant flag buys.  Accuracy evidence: random-weight
        # cosine > 0.995 (tests/test_int8_trunk.py); real-weight
        # validation pending artifacts, hence reported as opt-in.
        if (_os.environ.get("VLSA_TPU_BENCH_EXTRACT_Q8", "1") == "1"
                and _remaining() > 60.0):
            from vlsa_tpu.models.precision import (
                quantize_vision_tower_weights)
            qparams = quantize_vision_tower_weights(
                jax.tree.map(lambda t: t.astype(jnp.float32)
                             if t.dtype == jnp.bfloat16 else t, vparams))
            qparams = cast_vision_tower_weights(qparams)
            vit_q8 = ConchVisualModel(image_size=448,
                                      compute_dtype="bfloat16",
                                      trunk_quantized=True)

            def extract_q8_scan(p, xs):
                def body(chain, _):
                    out = vit_q8.apply(
                        {"params": p}, pre_dev(jnp.bitwise_xor(xs, chain)),
                        method=ConchVisualModel.forward_no_head)
                    return out[0, 0].astype(jnp.uint8), out
                _, outs = jax.lax.scan(body, jnp.uint8(0), jnp.arange(EN))
                return outs[-1]

            extract_q8_jit = jax.jit(extract_q8_scan)
            _ = float(extract_q8_jit(qparams, tiles_u8).sum())   # warm
            t_q8 = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                _ = float(extract_q8_jit(qparams, tiles_u8).sum())
                t_q8 = min(t_q8, (time.perf_counter() - t0) / EN)
            detail["int8_trunk_opt_in"] = {
                "tiles_per_sec": round(EB / t_q8, 1),
                "speedup_vs_bf16": round(t_u8 / t_q8, 3),
            }
        return detail

    lane("feature_extraction", est_s=90.0,
         enabled=(jax.default_backend() == "tpu"
                  and _os.environ.get("VLSA_TPU_BENCH_EXTRACT", "1") == "1"),
         fn=run_extract)

    # --- batched Shapley interpretation throughput (BASELINE config 4:
    # "Batched Shapley-values interpretation over TCGA-BLCA test split").
    # Per patient: VLFAN forward with attention, the decoupled prior-by-bin
    # similarity (ref utils/model_inference.py:81-144) and the exact 2^12-
    # coalition Shapley attribution (ref 23-79) — all vmapped on device.
    # The reference loops patients AND coalitions in Python on CPU. ---
    def run_interp():
        from vlsa_tpu.interpret.shapley import batched_shapley
        from vlsa_tpu.ops.masked import l2_normalize
        IB = int(_os.environ.get("VLSA_TPU_BENCH_INTERP_B", "64"))
        IN_SCAN = 10
        logit_scale_v = jnp.exp(params["logit_scale"])
        ifeats = jnp.asarray(
            np.random.default_rng(1).normal(size=(IB, N, D))
            .astype(np.float32)).astype(jnp.bfloat16)
        imask = jnp.ones((IB, N), bool)

        def interp_batch(p, feats_b, mask_b):
            variables = {"params": p}
            text = model.apply(variables, method=model.forward_text_only)
            norm_text = l2_normalize(text, axis=-1)            # [K, E]

            def _run(m):
                img, attn = m.encode_instances(feats_b, mask_b,
                                               ret_with_attn=True)
                A = attn[0] if isinstance(attn, tuple) else attn
                enc = m.mil_encoder.visual_adapter(feats_b)
                L_img = jnp.linalg.norm(img, axis=-1)
                dec = jnp.einsum("bpn,bnk->bpk", A,
                                 (enc / L_img[:, None, None])
                                 @ norm_text.T)
                return dec
            dec = model.apply(variables, method=_run)
            return batched_shapley(dec, logit_scale_v)

        def interp_scan(p, feats_b, mask_b):
            def body(chain, _):
                shap = interp_batch(p, feats_b + chain * 1e-30, mask_b)
                return shap[0, 0].astype(jnp.bfloat16), shap
            _, outs = jax.lax.scan(body, jnp.bfloat16(0.0),
                                   jnp.arange(IN_SCAN))
            return outs[-1]

        interp_jit = jax.jit(interp_scan)
        _ = float(interp_jit(params, ifeats, imask).sum())   # warm
        t_interp = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            _ = float(interp_jit(params, ifeats, imask).sum())
            t_interp = min(t_interp, (time.perf_counter() - t0) / IN_SCAN)
        return {
            "patients_per_sec": round(IB / t_interp, 1),
            "batch_patients": IB,
            "coalitions_per_patient": 4096,
            "note": ("decoupled similarity + exact 2^12-coalition "
                     "Shapley, vmapped (ref model_inference.py:23-144 "
                     "loops both in Python)"),
        }

    # est covers a cold-cache compile of the vmapped Shapley program
    # (observed 151 s; ~60 s warm) — understating it made a full run
    # overshoot the wall-clock budget by 70 s (round-5 rehearsal)
    lane("interpretation", est_s=150.0,
         enabled=_os.environ.get("VLSA_TPU_BENCH_INTERP", "1") == "1",
         fn=run_interp)

    # --- on-chip numerics revalidation of the HEADLINE kernels (VERDICT
    # r4 #3): reduced-shape coattn-int8 + ABMIL-q8 fwd+bwd vs a true-f32
    # XLA reference on identical data.  The full five-path run at
    # production shapes lives in scripts/validate_kernels_chip.py /
    # KERNELS_CHIP.json; this lane keeps every driver bench carrying
    # fresh hardware-validated numerics alongside the throughput. ---
    def run_kernels_chip():
        sys.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "scripts"))
        from validate_kernels_chip import run_checks
        res = run_checks(B=2, N=2048, C=512, P=12,
                         paths=["coattn_int8", "abmil_q8"])
        detail = {"shapes": res["shapes"], "ok": res["ok"]}
        for k in ("coattn_int8", "abmil_q8"):
            detail[k] = {kk: vv for kk, vv in res[k].items() if kk != "tol"}
        return detail

    lane("kernels_chip", est_s=120.0,
         enabled=(jax.default_backend() == "tpu"
                  and _os.environ.get("VLSA_TPU_BENCH_KERNELS", "1") == "1"),
         fn=run_kernels_chip)

    # the committed full-shape artifact rides along regardless, so the
    # record always carries SOME hardware numerics evidence
    kpath = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          "KERNELS_CHIP.json")
    if _os.path.exists(kpath):
        try:
            with open(kpath) as f:
                _k = json.load(f)
            result["detail"]["kernels_chip_artifact"] = {
                "ok": _k.get("ok"), "shapes": _k.get("shapes"),
                "paths_ok": {k: _k[k].get("ok") for k in
                             ("coattn_f32", "coattn_bf16", "coattn_int8",
                              "abmil_f32", "abmil_q8") if k in _k}}
            _emit(result)
        except Exception:
            pass

    # final (possibly identical) emit: the last line is the complete record
    _note(f"done ({_remaining():.0f}s budget left)")
    _emit(result)


if __name__ == "__main__":
    main()
