"""Fused masked cross-attention pooling — the hot op of the framework.

The language-guided aggregator reduces a bag of N patch features (N up to
tens of thousands) against P<=16 text-derived queries:

    Xn = l2norm(X);  A = softmax_N(scale * Q @ Xn^T);  out = A @ X

(ref: model/deepmil.py:185-204 — computed there as three separate torch ops
materialising the [P, N] attention matrix in HBM).

TPU-first design, both directions fused in Pallas:
  * forward: stream X through VMEM once per bag — row norms, scaled logits,
    online (flash-style) softmax over N-blocks, PV accumulation; emits the
    softmax stats (running max m, normaliser l) for the backward.
  * backward: one more streaming pass.  The softmax-Jacobian row term
    S[p] = sum_n A[p,n] * (g[p].X[n]) collapses to g[p].out[p] (out = A@X),
    so no extra reduction pass is needed; each block recomputes its logits
    from (m, l), forms dlogits, and accumulates
        dX = A^T g + (I - Xn Xn^T)/r . (s * dlogits^T Q)
        dQ = s * dlogits @ Xn         (accumulated across the whole grid)
    Nothing of size O(N) beyond dX itself touches HBM.

Matmul precision follows X's storage dtype.  With P <= 16 queries every
matmul is MXU *weight-load-bound* on the [bn, C] patch stream, so when the
pipeline stores bf16 features the kernels stream X in bf16 (≈2x the f32-
upcast rate) and:
  * the per-patch 1/l2norm is factored OUT of the matmuls
    (logits[p,n] = scale * inv[n] * (q . x[n])) so raw X is the operand,
  * the backward's logits + dA matmuls stack [Q; G] into ONE X.T stream,
  * every small M-side matrix (Q, G, softmax P, dlogits) is split hi+lo
    into two bf16 rows (free in the weight-bound regime), recovering
    ~f32 accuracy: kernel-vs-f32-compute error ~1e-4 on bf16 data.
f32-stored features keep the exact f32 path end to end.

`coattn_pool` is the public entry: Pallas on TPU, pure-XLA elsewhere.
"""
from __future__ import annotations

import os

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .masked import l2_normalize, masked_softmax

try:  # Pallas import is TPU-oriented; keep CPU-only installs working
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array

# Patch-axis tile for the flash-style streaming kernels.  2560 won the
# round-3 on-chip v5e sweeps for bf16 storage (fwd+bwd, B=128 x 10240 x
# 512: bf16 2048/2560 tie at 4.18 ms; bf16 5120 exceeds VMEM — chip-tested
# again round 5).  int8 streams 1 byte/feature, so ITS ceiling is higher:
# 5120 compiles and is ~10% faster end to end (round-5 chip A/B at
# B=1024/N=10240: 37.6k -> 41.3k slides/s; identical kernel numerics,
# KERNELS_CHIP tolerances re-verified at 5120; 10240 exceeds scoped VMEM
# by 180K).  f32 storage halves the tile again for the round-5
# precision=HIGHEST multi-pass expansion.  All overridable for other TPU
# generations.  Non-divisible N falls back down the chain.
_BLOCK_N = int(os.environ.get("VLSA_TPU_COATTN_BLOCK_N", "2560"))
_BLOCK_N_I8 = int(os.environ.get("VLSA_TPU_COATTN_BLOCK_N_I8", "5120"))
# f32 tiles: 1024, not 2048 — the true-f32 dots (_dotf precision=HIGHEST,
# round 5) expand to multi-pass MXU programs whose VMEM footprint no longer
# fits a 2048 tile (chip-tested: 2048 fails to compile, 1024 validates at
# fwd 9.2e-6 / dQ 2.7e-5 vs a true-f32 XLA reference)
_BLOCK_N_F32 = int(os.environ.get("VLSA_TPU_COATTN_BLOCK_N_F32", "1024"))
_STATS_LANES = 128  # m/l stored in a [P_pad, 128] tile (col 0 = m, col 1 = l)
INTERPRET = False   # set True (tests) to run the kernels in interpreter mode


def _pick_block(N: int, dtype=None):
    """Largest tile from the dtype's chain that divides N (None if none
    does -> caller falls back to the XLA reference path)."""
    if dtype == jnp.int8:
        top = _BLOCK_N_I8
    elif dtype == jnp.float32:
        top = _BLOCK_N_F32
    else:
        top = _BLOCK_N
    for b in (top, 2560, 2048, 1024, 512, 256, 128):
        if b > top:
            continue   # the fallback chain must never exceed the dtype cap
        b = min(b, N)
        if b % 128 == 0 and N % b == 0:
            return b
    return None


def _pick_block_dx(N: int, dtype):
    """Block chain for the full-backward (dX-writing) kernel.  It streams
    the x block IN and the dx block OUT, and Mosaic double-buffers both
    across grid steps — 2 x 2 x block x C x itemsize of scoped VMEM just
    for the feature tiles.  At f32/2048/C=512 that is 16 MB, 64 KB OVER
    the v5e scoped-vmem limit (found by scripts/validate_kernels_chip.py
    on the real chip — the interpreter-mode tests cannot see it), so this
    path halves the f32 tile and caps bf16 at 2048."""
    top = 1024 if dtype == jnp.float32 else min(_BLOCK_N, 2048)
    for b in (top, 1024, 512, 256, 128):
        b = min(b, N)
        if b % 128 == 0 and N % b == 0:
            return b
    return None


def dequantize_feats(x: Array, x_scale: Optional[Array]) -> Array:
    """Undo per-patch symmetric int8 quantization: x [.., N, C] int8,
    x_scale [.., N] f32 -> f32 features."""
    if x_scale is None:
        return x
    return x.astype(jnp.float32) * x_scale[..., None]


def coattn_pool_reference(q: Array, x: Array, mask: Optional[Array], scale,
                          x_scale: Optional[Array] = None) -> Array:
    """Pure-XLA reference: q [P, C] (pre-normalised/gated), x [B, N, C],
    mask [B, N] (bool) -> out [B, P, C]."""
    x = dequantize_feats(x, x_scale)
    xn = l2_normalize(x, axis=-1)
    logits = scale * jnp.einsum("pc,bnc->bpn", q, xn)
    m = None if mask is None else mask[:, None, :]
    attn = masked_softmax(logits, m, axis=-1)
    return jnp.einsum("bpn,bnc->bpc", attn, x)


def coattn_attention_reference(q: Array, x: Array, mask: Optional[Array], scale,
                               x_scale: Optional[Array] = None) -> Array:
    """Return the attention matrix [B, P, N] (interpretation path)."""
    x = dequantize_feats(x, x_scale)
    xn = l2_normalize(x, axis=-1)
    logits = scale * jnp.einsum("pc,bnc->bpn", q, xn)
    m = None if mask is None else mask[:, None, :]
    return masked_softmax(logits, m, axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _inv_norm_row(x):
    """Per-patch 1/l2norm of x [bn, C], returned in ROW layout [1, bn]
    (f32 accumulation regardless of storage dtype)."""
    xf = x.astype(jnp.float32)
    sq = jnp.sum(xf * xf, axis=-1, keepdims=True)        # [bn, 1]
    inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
    return inv.reshape(1, -1)                             # [1, bn]


def _mm_rows_i8(*mats):
    """Quantize small f32 M-side matrices into stacked int8 hi+lo rows for
    ONE int8 MXU matmul against an int8 patch stream.

    Per-matrix dynamic scale s = absmax/127:  t/s = hi + r  (hi = round,
    r in [-.5, .5]),  lo = round(254*r)  =>  t ~= s*(hi + lo/254) to ~15
    mantissa bits — the int8 twin of the bf16 hi/lo split (_mm_rows).  The
    int8 MXU mode streams the [bn, C] operand at ~1.5x the bf16 rate
    (measured on v5e, docs/PERF.md), and the int32 accumulation over C<=1024
    is exact (|prod| <= 127^2 * C << 2^31).
    Returns (stacked int8 [2*sum(M), C], per-matrix f32 scales)."""
    parts, scales = [], []
    for t in mats:
        tf = t.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(tf)), 1e-30) * (1.0 / 127.0)
        scaled = tf * (1.0 / s)
        hi = jnp.round(scaled)
        lo = jnp.round((scaled - hi) * 254.0)
        parts.extend([hi.astype(jnp.int8), lo.astype(jnp.int8)])
        scales.append(s)
    return (jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0],
            scales)


def _mm_unstack_i8(prod, scales):
    """Undo _mm_rows_i8 on the int32 product: per-matrix s*(hi + lo/254)."""
    rows = prod.shape[0] // (2 * len(scales))
    outs = []
    for k, s in enumerate(scales):
        base = 2 * k * rows
        hi = prod[base:base + rows].astype(jnp.float32)
        lo = prod[base + rows:base + 2 * rows].astype(jnp.float32)
        outs.append(s * (hi + lo * (1.0 / 254.0)))
    return outs



def _dotf(a, b, **kw):
    """MXU dot that keeps TRUE f32 when both operands are f32.  Without an
    explicit precision Mosaic lowers f32xf32 dots as ONE-PASS bf16
    (measured 2.5e-3 rel error on a real v5e; interpreter mode computes
    exact f32 and cannot see it — scripts/validate_kernels_chip.py round 5
    caught the f32 storage paths deviating 5-20%% through the scale-30
    softmax).  bf16/int8 operands keep the default: those are the hi/lo
    and native-int8 paths, already precision-engineered."""
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        kw.setdefault("precision", jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, **kw)


def _stream_matmul(mats, x, transpose: bool):
    """dot(stack(mats), x.T | x) against the patch stream in its STORAGE
    dtype — int8 runs the native int8 MXU mode, bf16/f32 the hi/lo bf16
    path.  Returns the per-matrix f32 products."""
    operand = x.T if transpose else x
    if x.dtype == jnp.int8:
        stacked, scales = _mm_rows_i8(*mats)
        prod = jnp.dot(stacked, operand, preferred_element_type=jnp.int32)
        return _mm_unstack_i8(prod, scales)
    stacked, np_ = _mm_rows(*mats, dtype=x.dtype)
    prod = _dotf(stacked, operand, preferred_element_type=jnp.float32)
    return _mm_unstack(prod, len(mats), np_)


def _mm_rows(*mats, dtype):
    """Stack matrices along rows for ONE matmul against a shared x stream.

    When `dtype` is bf16, each f32 matrix is split into hi + lo bf16 halves
    (t = hi + lo to ~16 mantissa bits).  The matmuls these feed are MXU
    weight-load-bound on the [bn, C] patch stream with M = P <= 16, so extra
    M rows are free — the split recovers near-f32 accuracy at bf16 speed.
    Returns (stacked [k*M, C or bn], n_parts per matrix)."""
    if dtype != jnp.bfloat16:
        return jnp.concatenate(mats, axis=0) if len(mats) > 1 else mats[0], 1
    parts = []
    for t in mats:
        tf = t.astype(jnp.float32)
        hi = tf.astype(jnp.bfloat16)
        lo = (tf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        parts.extend([hi, lo])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0], 2


def _mm_unstack(prod, n_mats, n_parts):
    """Undo _mm_rows on the matmul product: sum hi/lo partial products and
    return the per-matrix results."""
    rows = prod.shape[0] // (n_mats * n_parts)
    outs = []
    for k in range(n_mats):
        base = k * n_parts * rows
        acc = prod[base:base + rows]
        if n_parts == 2:
            acc = acc + prod[base + rows:base + 2 * rows]
        outs.append(acc)
    return outs


def _coattn_fwd_body(q_ref, x_ref, xs_ref, xi_ref, mask_ref, scale_ref,
                     out_ref, stats_ref, m_scr, l_scr, acc_scr, *,
                     n_blocks: int):
    """Grid (B, nN); scratch persists across the sequential N dimension.

    The per-patch l2 norm is factored OUT of the matmuls
    (logits[p,n] = scale * inv[n] * (q . x[n])), so the MXU streams the
    patch block in its storage dtype — native bf16 when the pipeline stores
    bf16 features (the production config), f32 otherwise.  With P<=16 the
    matmuls are MXU weight-load-bound, so halving the operand bytes roughly
    halves kernel time.  Softmax stats stay f32.

    int8 storage (`xs_ref` set): per-patch symmetric quantization
    x_deq[n] = s[n] * x_i[n].  The normalised logits are INVARIANT to the
    per-patch scale (q . x_deq[n]) / ||x_deq[n]|| = (q . x_i[n]) / ||x_i[n]||,
    so the logit path runs on the raw int8 values; only the PV accumulation
    needs the scale, folded into the softmax weights (p * s) — the dequantised
    features are never materialised."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]                      # [P, C] f32
    x = x_ref[0]                      # [bn, C] storage dtype (int8/bf16/f32)
    msk = mask_ref[0, 0]              # [bn]
    scale = scale_ref[0, 0]

    # host-precomputed 1/l2norm (int8 pipeline) skips the only O(bn*C)
    # VPU reduction in the kernel
    inv_row = (_inv_norm_row(x) if xi_ref is None
               else xi_ref[0, 0][None, :])                # [1, bn]
    raw, = _stream_matmul([q], x, transpose=True)         # [P, bn]
    logits = scale * raw * inv_row
    logits = jnp.where(msk[None, :] > 0, logits, -1e30)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    p = jnp.where(msk[None, :] > 0, p, 0.0)
    # int8: fold the dequant scale into the softmax weights so pv equals
    # A_block @ X_deq_block; `l` keeps accumulating the UNSCALED p
    pv_weights = p if xs_ref is None else p * xs_ref[0, 0][None, :]
    pv, = _stream_matmul([pv_weights], x, transpose=False)  # [P, C]
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + pv
    m_scr[:] = m_new

    @pl.when(i == n_blocks - 1)
    def _finalize():
        l_safe = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = acc_scr[:] / l_safe
        P_pad = m_scr.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (P_pad, _STATS_LANES), 1)
        stats = jnp.where(lane == 0, m_scr[:], 0.0) + jnp.where(lane == 1, l_safe, 0.0)
        stats_ref[0] = stats


def _coattn_fwd_kernel(q_ref, x_ref, mask_ref, scale_ref, out_ref, stats_ref,
                       m_scr, l_scr, acc_scr, *, n_blocks: int):
    _coattn_fwd_body(q_ref, x_ref, None, None, mask_ref, scale_ref, out_ref,
                     stats_ref, m_scr, l_scr, acc_scr, n_blocks=n_blocks)


def _coattn_fwd_kernel_q8(q_ref, x_ref, xs_ref, mask_ref, scale_ref, out_ref,
                          stats_ref, m_scr, l_scr, acc_scr, *, n_blocks: int):
    _coattn_fwd_body(q_ref, x_ref, xs_ref, None, mask_ref, scale_ref, out_ref,
                     stats_ref, m_scr, l_scr, acc_scr, n_blocks=n_blocks)


def _coattn_fwd_kernel_q8i(q_ref, x_ref, xs_ref, xi_ref, mask_ref, scale_ref,
                           out_ref, stats_ref, m_scr, l_scr, acc_scr, *,
                           n_blocks: int):
    _coattn_fwd_body(q_ref, x_ref, xs_ref, xi_ref, mask_ref, scale_ref,
                     out_ref, stats_ref, m_scr, l_scr, acc_scr,
                     n_blocks=n_blocks)


def _coattn_fwd_kernel_i(q_ref, x_ref, xi_ref, mask_ref, scale_ref,
                         out_ref, stats_ref, m_scr, l_scr, acc_scr, *,
                         n_blocks: int):
    """bf16/f32 storage with host-precomputed 1/l2norms (no dequant scale)."""
    _coattn_fwd_body(q_ref, x_ref, None, xi_ref, mask_ref, scale_ref,
                     out_ref, stats_ref, m_scr, l_scr, acc_scr,
                     n_blocks=n_blocks)


def _coattn_bwd_kernel(q_ref, x_ref, mask_ref, scale_ref, g_ref, out_ref,
                       stats_ref, dx_ref, dq_ref, dq_scr, *, n_blocks: int):
    """Grid (B, nN); dq accumulates in scratch across the ENTIRE grid."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(0)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[:]                      # [P, C] f32
    x = x_ref[0]                      # [bn, C] storage dtype (bf16 or f32)
    msk = mask_ref[0, 0]              # [bn]
    scale = scale_ref[0, 0]
    g = g_ref[0]                      # [P, C] f32
    out = out_ref[0]                  # [P, C]
    m = stats_ref[0][:, 0:1]          # [P, 1]
    l = stats_ref[0][:, 1:2]          # [P, 1]

    inv_row = _inv_norm_row(x)                            # [1, bn]
    # one stacked matmul against x.T: the logits dot (q . x[n]) and the
    # attention cotangent dA[p,n] = g[p] . x[n] share one MXU weight stream
    qg, np_ = _mm_rows(q, g, dtype=x.dtype)
    both = _dotf(qg, x.T, preferred_element_type=jnp.float32)
    raw, da = _mm_unstack(both, 2, np_)                   # [P, bn] each
    logits = scale * raw * inv_row
    logits = jnp.where(msk[None, :] > 0, logits, -1e30)
    a = jnp.exp(logits - m) / l                           # [P, bn]
    a = jnp.where(msk[None, :] > 0, a, 0.0)

    # S[p] = g[p] . out[p]
    s_row = jnp.sum(g * out, axis=-1, keepdims=True)               # [P, 1]
    dlogits = a * (da - s_row)                                     # [P, bn]
    # fold the norm into the logit cotangent once: dl_inv = dlogits * inv[n]
    dl_inv = dlogits * inv_row                                     # [P, bn]

    # dX = A^T g + inv * (I - xn xn^T) dxn, with xn = x*inv never
    # materialised as a matmul operand.  Using dxn_hat := inv * dxn:
    #   dxn_hat[n] = scale * sum_p dl_inv[p,n] q[p]        (one matmul)
    #   inv*(dxn - xn proj) = dxn_hat - x * inv^2 * (x . dxn_hat)
    dxn_hat = scale * _dotf(
        dl_inv.T.astype(x.dtype), q, preferred_element_type=jnp.float32)  # [bn, C]
    xf = x.astype(jnp.float32)
    inv_col = jax.lax.rsqrt(jnp.maximum(
        jnp.sum(xf * xf, axis=-1, keepdims=True), 1e-24))          # [bn, 1]
    proj = jnp.sum(xf * dxn_hat, axis=-1, keepdims=True) * (inv_col * inv_col)
    dx = _dotf(a.T.astype(x.dtype), g.astype(x.dtype),
               preferred_element_type=jnp.float32) \
        + (dxn_hat - xf * proj)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    dls, np_ = _mm_rows(dl_inv, dtype=x.dtype)
    dqc, = _mm_unstack(_dotf(dls, x, preferred_element_type=jnp.float32),
                       1, np_)                            # [P, C]
    dq_scr[:] = dq_scr[:] + scale * dqc

    @pl.when(jnp.logical_and(b == n_b - 1, i == n_blocks - 1))
    def _finalize():
        dq_ref[:] = dq_scr[:]


def _coattn_bwd_dq_body(q_ref, x_ref, xs_ref, xi_ref, mask_ref, scale_ref,
                        g_ref, out_ref, stats_ref, dq_ref, dq_scr, *,
                        n_blocks: int):
    """dQ-only backward: for models where the patch features are constants
    (no feat projecter / instance adapter upstream), the dX pass is dead
    work — this kernel skips the [B, N, C] cotangent entirely (one fewer
    HBM write of B*N*C floats plus one fewer [bn,C]x[C,P] matmul).

    int8 storage (`xs_ref` set): the normalised-logit recompute and the
    dQ contraction sum(dlogits * inv * x) are both invariant to the per-patch
    dequant scale (inv_deq[n]*x_deq[n] = inv_i[n]*x_i[n]); only the attention
    cotangent dA[p,n] = g[p] . x_deq[n] needs it (da_i * s[n])."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(0)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[:]                      # [P, C] f32
    x = x_ref[0]                      # [bn, C] storage dtype (int8/bf16/f32)
    msk = mask_ref[0, 0]
    scale = scale_ref[0, 0]
    g = g_ref[0]                      # [P, C] f32
    out = out_ref[0]
    m = stats_ref[0][:, 0:1]
    l = stats_ref[0][:, 1:2]

    inv_row = (_inv_norm_row(x) if xi_ref is None
               else xi_ref[0, 0][None, :])                # [1, bn]
    # stacked matmul: logits dot + dA share one x.T stream (see bwd kernel)
    raw, da = _stream_matmul([q, g], x, transpose=True)   # [P, bn] each
    if xs_ref is not None:
        da = da * xs_ref[0, 0][None, :]                   # g . x_deq
    logits = scale * raw * inv_row
    logits = jnp.where(msk[None, :] > 0, logits, -1e30)
    a = jnp.exp(logits - m) / l
    a = jnp.where(msk[None, :] > 0, a, 0.0)

    s_row = jnp.sum(g * out, axis=-1, keepdims=True)
    dl_inv = (a * (da - s_row)) * inv_row                 # dlogits * inv[n]

    dqc, = _stream_matmul([dl_inv], x, transpose=False)
    dq_scr[:] = dq_scr[:] + scale * dqc

    @pl.when(jnp.logical_and(b == n_b - 1, i == n_blocks - 1))
    def _finalize():
        dq_ref[:] = dq_scr[:]


def _coattn_bwd_dq_kernel(q_ref, x_ref, mask_ref, scale_ref, g_ref, out_ref,
                          stats_ref, dq_ref, dq_scr, *, n_blocks: int):
    _coattn_bwd_dq_body(q_ref, x_ref, None, None, mask_ref, scale_ref, g_ref,
                        out_ref, stats_ref, dq_ref, dq_scr, n_blocks=n_blocks)


def _coattn_bwd_dq_kernel_q8(q_ref, x_ref, xs_ref, mask_ref, scale_ref, g_ref,
                             out_ref, stats_ref, dq_ref, dq_scr, *,
                             n_blocks: int):
    _coattn_bwd_dq_body(q_ref, x_ref, xs_ref, None, mask_ref, scale_ref,
                        g_ref, out_ref, stats_ref, dq_ref, dq_scr,
                        n_blocks=n_blocks)


def _coattn_bwd_dq_kernel_q8i(q_ref, x_ref, xs_ref, xi_ref, mask_ref,
                              scale_ref, g_ref, out_ref, stats_ref, dq_ref,
                              dq_scr, *, n_blocks: int):
    _coattn_bwd_dq_body(q_ref, x_ref, xs_ref, xi_ref, mask_ref, scale_ref,
                        g_ref, out_ref, stats_ref, dq_ref, dq_scr,
                        n_blocks=n_blocks)


def _coattn_bwd_dq_kernel_i(q_ref, x_ref, xi_ref, mask_ref, scale_ref, g_ref,
                            out_ref, stats_ref, dq_ref, dq_scr, *,
                            n_blocks: int):
    _coattn_bwd_dq_body(q_ref, x_ref, None, xi_ref, mask_ref, scale_ref,
                        g_ref, out_ref, stats_ref, dq_ref, dq_scr,
                        n_blocks=n_blocks)


def _pad_q(q):
    P = q.shape[0]
    P_pad = max(8, int(np.ceil(P / 8)) * 8)
    if P_pad != P:
        q = jnp.pad(q, ((0, P_pad - P), (0, 0)))
    return q, P, P_pad


def _coattn_pallas_fwd(q: Array, x: Array, mask: Array, scale: Array,
                       x_scale: Optional[Array] = None,
                       x_inv: Optional[Array] = None):
    B, N, C = x.shape
    block_n = _pick_block(N, x.dtype)
    assert block_n is not None, f"bag length {N} has no 128-aligned tile"
    n_blocks = N // block_n
    q, P, P_pad = _pad_q(q)

    x_block = pl.BlockSpec((1, block_n, C), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM)
    if x_scale is None and x_inv is None:
        kernel = functools.partial(_coattn_fwd_kernel, n_blocks=n_blocks)
        xs_specs, xs_args = [], ()
    elif x_scale is None:
        kernel = functools.partial(_coattn_fwd_kernel_i, n_blocks=n_blocks)
        xs_specs = [row_block]
        xs_args = (x_inv.astype(jnp.float32)[:, None, :],)
    elif x_inv is None:
        kernel = functools.partial(_coattn_fwd_kernel_q8, n_blocks=n_blocks)
        xs_specs = [row_block]
        xs_args = (x_scale.astype(jnp.float32)[:, None, :],)
    else:
        kernel = functools.partial(_coattn_fwd_kernel_q8i, n_blocks=n_blocks)
        xs_specs = [row_block, row_block]
        xs_args = (x_scale.astype(jnp.float32)[:, None, :],
                   x_inv.astype(jnp.float32)[:, None, :])
    out, stats = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((P_pad, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            x_block,
            *xs_specs,
            row_block,
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, _STATS_LANES), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P_pad, C), jnp.float32),
            jax.ShapeDtypeStruct((B, P_pad, _STATS_LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((P_pad, 1), jnp.float32),
            pltpu.VMEM((P_pad, 1), jnp.float32),
            pltpu.VMEM((P_pad, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * (P_pad + 1) + 2 * B * P_pad * N * C,
            bytes_accessed=x.dtype.itemsize * B * N * C
            + 4 * (B * P_pad * C + P_pad * C),
            transcendentals=B * P_pad * N,
        ),
    )(q.astype(jnp.float32), x, *xs_args,
      mask.astype(jnp.float32)[:, None, :],
      jnp.asarray(scale, jnp.float32).reshape(1, 1))
    return out, stats, P, P_pad


def _coattn_pallas_bwd(q_pad, x, mask, scale, g_pad, out_pad, stats):
    B, N, C = x.shape
    block_n = _pick_block_dx(N, x.dtype)
    n_blocks = N // block_n
    P_pad = q_pad.shape[0]

    kernel = functools.partial(_coattn_bwd_kernel, n_blocks=n_blocks)
    dx, dq = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((P_pad, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, _STATS_LANES), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P_pad, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((P_pad, C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((P_pad, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * C * P_pad,
            bytes_accessed=2 * x.dtype.itemsize * B * N * C + 4 * 3 * B * P_pad * C,
            transcendentals=B * P_pad * N,
        ),
    )(q_pad, x, mask.astype(jnp.float32)[:, None, :],
      jnp.asarray(scale, jnp.float32).reshape(1, 1), g_pad, out_pad, stats)
    return dx, dq


def _coattn_pallas_bwd_dq(q_pad, x, mask, scale, g_pad, out_pad, stats,
                          x_scale: Optional[Array] = None,
                          x_inv: Optional[Array] = None):
    B, N, C = x.shape
    block_n = _pick_block(N, x.dtype)
    n_blocks = N // block_n
    P_pad = q_pad.shape[0]

    x_block = pl.BlockSpec((1, block_n, C), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM)
    if x_scale is None and x_inv is None:
        kernel = functools.partial(_coattn_bwd_dq_kernel, n_blocks=n_blocks)
        xs_specs, xs_args = [], ()
    elif x_scale is None:
        kernel = functools.partial(_coattn_bwd_dq_kernel_i, n_blocks=n_blocks)
        xs_specs = [row_block]
        xs_args = (x_inv.astype(jnp.float32)[:, None, :],)
    elif x_inv is None:
        kernel = functools.partial(_coattn_bwd_dq_kernel_q8, n_blocks=n_blocks)
        xs_specs = [row_block]
        xs_args = (x_scale.astype(jnp.float32)[:, None, :],)
    else:
        kernel = functools.partial(_coattn_bwd_dq_kernel_q8i,
                                   n_blocks=n_blocks)
        xs_specs = [row_block, row_block]
        xs_args = (x_scale.astype(jnp.float32)[:, None, :],
                   x_inv.astype(jnp.float32)[:, None, :])
    dq = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((P_pad, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            x_block,
            *xs_specs,
            row_block,
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad, _STATS_LANES), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P_pad, C), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P_pad, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * P_pad,
            bytes_accessed=x.dtype.itemsize * B * N * C + 4 * 3 * B * P_pad * C,
            transcendentals=B * P_pad * N,
        ),
    )(q_pad, x, *xs_args, mask.astype(jnp.float32)[:, None, :],
      jnp.asarray(scale, jnp.float32).reshape(1, 1), g_pad, out_pad, stats)
    return dq


@jax.custom_vjp
def _coattn_pool_tpu_nodx(q, x, mask, scale):
    out, _stats, P, _P_pad = _coattn_pallas_fwd(q, x, mask, scale)
    return out[:, :P, :]


@jax.custom_vjp
def _coattn_pool_tpu(q, x, mask, scale):
    out, _stats, P, _P_pad = _coattn_pallas_fwd(q, x, mask, scale)
    return out[:, :P, :]


def _coattn_fwd_rule(q, x, mask, scale):
    out, stats, P, P_pad = _coattn_pallas_fwd(q, x, mask, scale)
    q_pad, _, _ = _pad_q(q)
    return out[:, :P, :], (q_pad, x, mask, scale, out, stats, P)


def _coattn_bwd_rule(res, g):
    q_pad, x, mask, scale, out_pad, stats, P = res
    if x.dtype == jnp.float32 and not INTERPRET:
        # Mosaic cannot compile the dX-writing kernel with true-f32 dots
        # at ANY viable tile (precision=HIGHEST expansion: chip-tested
        # failures at 2048/1024/512 blocks; default precision silently
        # computes bf16 and deviated 16-20% through the scale-30 softmax,
        # scripts/validate_kernels_chip.py round 5).  f32 storage is the
        # exactness-compat route, so its full backward recomputes through
        # XLA pinned to true-f32 matmuls; the Pallas forward stays
        # (chip-validated 9.2e-6).  bf16 keeps the fused dX kernel.
        q = q_pad[:P].astype(jnp.float32)
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(
                lambda q_, x_: coattn_pool_reference(q_, x_, mask, scale),
                q, x)
            dq, dx = vjp(g)
        return dq, dx, None, None
    P_pad = q_pad.shape[0]
    g_pad = jnp.pad(g, ((0, 0), (0, P_pad - P), (0, 0))) if P_pad != P else g
    dx, dq = _coattn_pallas_bwd(q_pad.astype(jnp.float32), x, mask, scale,
                                g_pad.astype(jnp.float32), out_pad, stats)
    return dq[:P], dx, None, None


_coattn_pool_tpu.defvjp(_coattn_fwd_rule, _coattn_bwd_rule)


def _coattn_nodx_bwd_rule(res, g):
    q_pad, x, mask, scale, out_pad, stats, P = res
    P_pad = q_pad.shape[0]
    g_pad = jnp.pad(g, ((0, 0), (0, P_pad - P), (0, 0))) if P_pad != P else g
    dq = _coattn_pallas_bwd_dq(q_pad.astype(jnp.float32), x, mask, scale,
                               g_pad.astype(jnp.float32), out_pad, stats)
    # x is declared constant on this path; its zero cotangent is DCE'd
    return dq[:P], jnp.zeros_like(x), None, None


_coattn_pool_tpu_nodx.defvjp(_coattn_fwd_rule, _coattn_nodx_bwd_rule)


@jax.custom_vjp
def _coattn_pool_tpu_nodx_q8(q, x, x_scale, x_inv, mask, scale):
    """Extended constant-features variant (dQ-only backward):
    * x int8 + x_scale [B, N] per-patch dequant scales (feats_dtype: int8),
    * x_inv [B, N] host-precomputed 1/||x_stored|| (int8 OR bf16 storage) —
      skips the kernels' only O(N*C) VPU reduction; None = reduce in-kernel.
    """
    out, _stats, P, _P_pad = _coattn_pallas_fwd(q, x, mask, scale,
                                                x_scale, x_inv)
    return out[:, :P, :]


def _coattn_q8_fwd_rule(q, x, x_scale, x_inv, mask, scale):
    out, stats, P, P_pad = _coattn_pallas_fwd(q, x, mask, scale,
                                              x_scale, x_inv)
    q_pad, _, _ = _pad_q(q)
    return out[:, :P, :], (q_pad, x, x_scale, x_inv, mask, scale, out,
                           stats, P)


def _coattn_q8_bwd_rule(res, g):
    q_pad, x, x_scale, x_inv, mask, scale, out_pad, stats, P = res
    P_pad = q_pad.shape[0]
    g_pad = jnp.pad(g, ((0, 0), (0, P_pad - P), (0, 0))) if P_pad != P else g
    dq = _coattn_pallas_bwd_dq(q_pad.astype(jnp.float32), x, mask, scale,
                               g_pad.astype(jnp.float32), out_pad, stats,
                               x_scale, x_inv)
    return dq[:P], None, None, None, None, None


_coattn_pool_tpu_nodx_q8.defvjp(_coattn_q8_fwd_rule, _coattn_q8_bwd_rule)


def coattn_pool(q: Array, x: Array, mask: Optional[Array], scale,
                use_pallas: Optional[bool] = None,
                x_stop_gradient: bool = False,
                x_scale: Optional[Array] = None,
                x_inv: Optional[Array] = None) -> Array:
    """Fused masked cross-attention pooling.

    q [P, C] effective queries (already l2-normalised and gate-combined),
    x [B, N, C] raw patch features, mask [B, N] validity, scale scalar.
    Returns [B, P, C].

    `x_stop_gradient=True` declares the patch features constants: the
    backward uses the dQ-only kernel, skipping the [B, N, C] dX write —
    the right setting whenever nothing learnable feeds X (VLFAN without a
    feat projecter, the common production config).

    int8 storage (`feats_dtype: int8`): x int8 with per-patch dequant
    scales `x_scale` [B, N] — halves the kernels' HBM stream again vs bf16
    and runs the MXU's native int8 mode.  `x_inv` [B, N] optionally carries
    host-precomputed 1/||x_int|| (data/pipeline.py::feats_inv_norms),
    removing the kernels' only O(N*C) VPU reduction.  Only valid with
    `x_stop_gradient=True` (quantized features are constants by
    construction).

    Note: `scale` is treated as a constant in the Pallas path (the VLFAN
    co-attention scale is a frozen buffer, ref deepmil.py:121-126).
    """
    if x.dtype == jnp.int8:
        assert x_scale is not None, "int8 features need x_scale [B, N]"
        assert x_stop_gradient, \
            "int8 features are constants; use x_stop_gradient=True " \
            "(quantized storage cannot back-propagate into a feat projecter)"
    if use_pallas is None:
        from .flags import pallas_disabled
        use_pallas = (_HAS_PALLAS and jax.default_backend() == "tpu"
                      and _pick_block(x.shape[1], x.dtype) is not None
                      and not pallas_disabled())
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    if use_pallas:
        scale = jnp.asarray(scale, jnp.float32)
        if x.dtype == jnp.int8:
            return _coattn_pool_tpu_nodx_q8(q, x, x_scale, x_inv, mask, scale)
        if x_stop_gradient:
            if x_inv is not None:
                # bf16/f32 storage with host-precomputed norms (pipeline
                # feats_inv): same math, no in-kernel O(N*C) reduction
                return _coattn_pool_tpu_nodx_q8(
                    q, jax.lax.stop_gradient(x), None, x_inv, mask, scale)
            return _coattn_pool_tpu_nodx(q, jax.lax.stop_gradient(x), mask, scale)
        return _coattn_pool_tpu(q, x, mask, scale)
    if x_stop_gradient:
        x = jax.lax.stop_gradient(x)
        x_scale = None if x_scale is None else jax.lax.stop_gradient(x_scale)
    return coattn_pool_reference(q, x, mask, scale, x_scale=x_scale)
