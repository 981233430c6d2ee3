"""Fused ABMIL attention pooling — the SA-family hot op.

The ABMIL head computes per-patch scores through a tanh bottleneck and
softmax-pools the bag (ref model/layers.py:125-153):

    a_n = w2 . tanh(W1 x_n + b1) + b2;   out = sum_n softmax(a)_n * x_n

On TPU the [B, N, hid] tanh intermediate dominates HBM traffic; the Pallas
kernel streams X once per bag, computing the projection, the masked online
softmax, and the weighted-sum accumulation in VMEM.  Backward is a second
streaming pass: it recomputes the bottleneck from the saved softmax stats,
writes dX in-stream, and accumulates dW1/db1/dw2 in VMEM scratch across the
whole grid (same flash trick as ops/coattn.py).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .coattn import (_dotf, _mm_rows, _mm_unstack, _stream_matmul,
                     dequantize_feats)
from .masked import masked_softmax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array

# 1280 won the on-chip v5e sweep with bf16 streaming (B=64 x N=10240 x
# D=512 full train step: f32@1024 8.16 ms -> bf16@1024 7.49 -> bf16@1280
# 7.26 ms; bf16@2560 fails to compile) — examples/bench_abmil.py.
# int8 streams 1 byte/feature so its ceiling is higher: 2560 compiles and
# is ~6% faster (round-5 chip A/B: q8 7.90 -> 7.44 ms/step at B=64; 5120
# fails to compile) — numerics re-verified at 2560.
_BLOCK_N = int(os.environ.get("VLSA_TPU_ABMIL_BLOCK_N", "1280"))
_BLOCK_N_I8 = int(os.environ.get("VLSA_TPU_ABMIL_BLOCK_N_I8", "2560"))


def pick_block(N: int, dtype=None):
    """Largest 128-aligned tile dividing N (2048 stays out of the fallback
    chain: the bwd's [bn, hid] intermediates exceed VMEM there).

    f32 storage caps at 512: the f32 backward at block 1280 CRASHES the
    Mosaic compiler on a real v5e, and with the round-5 true-f32 dots
    (precision=HIGHEST) so does 1024; 512 compiles and validates at
    ~2e-6 vs a true-f32 XLA reference (scripts/validate_kernels_chip.py
    — the round-3 on-chip sweep only ever ran f32 at 1024 with the old
    silently-bf16 dots, so none of this was visible)."""
    if dtype == jnp.int8:
        top = _BLOCK_N_I8
    elif dtype == jnp.float32:
        top = min(_BLOCK_N, 512)
    else:
        top = _BLOCK_N
    for b in (top, 2560, 1280, 1024, 512, 256, 128):
        if b > top:
            continue   # the fallback chain must never exceed the dtype cap
        b = min(b, N)
        if b % 128 == 0 and N % b == 0:
            return b
    return None
INTERPRET = False


# hi/lo splits on the [*, hid]-output matmuls double their MXU cycles —
# unlike coattn's P<=16 rows they are NOT free at hid=256 (measured: the
# split made the B=64 SA step SLOWER, 8.2 -> 11.0 ms).  Default is a
# single-rounded bf16 w1/dz (the precision the MXU applies to f32 operands
# under default matmul precision anyway); set VLSA_TPU_ABMIL_PRECISE=1 to
# pay 2x matmul cycles for ~f32 bottleneck accuracy.
_PRECISE = os.environ.get("VLSA_TPU_ABMIL_PRECISE", "0") == "1"


def _h_matmul(x, w1):
    """h_pre [bn, hid] = x @ w1.T with x in its STORAGE dtype (bf16 streams
    natively; f32 keeps the exact path)."""
    if x.dtype == jnp.float32:
        return _dotf(x, w1.T, preferred_element_type=jnp.float32)
    if not _PRECISE:
        return jnp.dot(x, w1.astype(x.dtype).T,
                       preferred_element_type=jnp.float32)
    parts, np_ = _mm_rows(w1, dtype=x.dtype)        # [np*hid, D]
    prod = jnp.dot(x, parts.T, preferred_element_type=jnp.float32)
    if np_ == 2:
        hid = w1.shape[0]
        return prod[:, :hid] + prod[:, hid:]
    return prod


def _dz_w1_matmul(dz, w1, dtype):
    """dx contribution dz @ w1 with the contraction in `dtype`."""
    if dtype == jnp.float32:
        return _dotf(dz, w1, preferred_element_type=jnp.float32)
    if not _PRECISE:
        return jnp.dot(dz.astype(dtype), w1.astype(dtype),
                       preferred_element_type=jnp.float32)
    hi = dz.astype(jnp.bfloat16)
    lo = (dz - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    return jnp.dot(jnp.concatenate([hi, lo], axis=1),
                   jnp.concatenate([w1b, w1b], axis=0),
                   preferred_element_type=jnp.float32)


def abmil_pool_reference(x, mask, w1, b1, w2, b2):
    """x [B,N,D]; w1 [hid,D]; b1 [hid]; w2 [hid]; b2 scalar -> (out [B,D], raw [B,N])."""
    h = jnp.tanh(jnp.einsum("bnd,hd->bnh", x, w1) + b1)
    raw = jnp.einsum("bnh,h->bn", h, w2) + b2
    attn = masked_softmax(raw, mask, axis=-1)
    return jnp.einsum("bn,bnd->bd", attn, x), raw


def _abmil_kernel(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, out_ref, stats_ref,
                  m_scr, l_scr, acc_scr, *, n_blocks: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[0, 0] = -1e30
        l_scr[0, 0] = 0.0
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0]                          # [bn, D] storage dtype (bf16/f32)
    msk = mask_ref[0, 0]                  # [bn]
    w1 = w1_ref[:]                        # [hid, D]
    b1 = b1_ref[0]                        # [hid] (stored [1, hid])
    w2 = w2_ref[0]                        # [hid]

    h = jnp.tanh(_h_matmul(x, w1) + b1[None, :])
    logits = jnp.sum(h * w2[None, :], axis=-1)           # [bn] (b2 cancels in softmax)
    logits = jnp.where(msk > 0, logits, -1e30)

    m_prev = m_scr[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(logits))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    p = jnp.where(msk > 0, p, 0.0)
    l_scr[0, 0] = l_scr[0, 0] * corr + jnp.sum(p)
    ps, np_ = _mm_rows(p[None, :], dtype=x.dtype)
    pv, = _mm_unstack(_dotf(ps, x, preferred_element_type=jnp.float32),
                      1, np_)                            # [1, D]
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[0, 0] = m_new

    @pl.when(i == n_blocks - 1)
    def _fin():
        out_ref[0] = acc_scr[:] / jnp.maximum(l_scr[0, 0], 1e-30)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats_ref[0] = (jnp.where(lane == 0, m_scr[0, 0], 0.0)
                        + jnp.where(lane == 1, jnp.maximum(l_scr[0, 0], 1e-30), 0.0))


def _abmil_pallas(x, mask, w1, b1, w2):
    B, N, D = x.shape
    hid = w1.shape[0]
    block_n = pick_block(N, x.dtype)
    assert block_n is not None
    n_blocks = N // block_n
    kernel = functools.partial(_abmil_kernel, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * (hid + 1),
            bytes_accessed=4 * (B * N * D + B * D + hid * D),
            transcendentals=B * N * (hid + 1),
        ),
    )(x, mask.astype(jnp.float32)[:, None, :],
      w1.astype(jnp.float32), b1.astype(jnp.float32)[None, :],
      w2.astype(jnp.float32)[None, :])
    out, stats = out
    return out[:, 0, :], stats


def _abmil_bwd_kernel(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, g_ref, out_ref,
                      stats_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                      dw1_scr, db1_scr, dw2_scr, *, n_blocks: int):
    """Streaming backward: one more pass over X.  Per block it recomputes the
    tanh bottleneck and the softmax from the saved (m, l) stats, writes dX
    in-stream, and accumulates dW1/db1/dw2 in VMEM scratch across the entire
    grid (flash trick: sum_n a_n (g.x_n) = g.out collapses the softmax
    Jacobian row term)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(0)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dw1_scr[:] = jnp.zeros_like(dw1_scr)
        db1_scr[:] = jnp.zeros_like(db1_scr)
        dw2_scr[:] = jnp.zeros_like(dw2_scr)

    x = x_ref[0]                          # [bn, D] storage dtype (bf16/f32)
    msk = mask_ref[0, 0]                  # [bn]
    w1 = w1_ref[:]                        # [hid, D]
    b1 = b1_ref[0]                        # [hid]
    w2 = w2_ref[0]                        # [hid]
    g = g_ref[0]                          # [1, D]
    out = out_ref[0]                      # [1, D]
    m = stats_ref[0][0, 0]
    l = stats_ref[0][0, 1]

    h = jnp.tanh(_h_matmul(x, w1) + b1[None, :])
    logits = jnp.sum(h * w2[None, :], axis=-1)
    logits = jnp.where(msk > 0, logits, -1e30)
    a = jnp.exp(logits - m) / l
    a = jnp.where(msk > 0, a, 0.0)                       # [bn]

    gs, np_ = _mm_rows(g, dtype=x.dtype)
    gx_row, = _mm_unstack(_dotf(gs, x.T, preferred_element_type=jnp.float32),
                          1, np_)                               # [1, bn]
    gx = gx_row[0]                                              # [bn]
    gout = jnp.sum(g[0] * out[0])                               # scalar
    ds = a * (gx - gout)                                        # [bn]
    dz = (ds[:, None] * w2[None, :]) * (1.0 - h * h)            # [bn, hid]

    dx = a[:, None] * g + _dz_w1_matmul(dz, w1, x.dtype)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    if _PRECISE or x.dtype == jnp.float32:
        dzs, np_ = _mm_rows(dz.T, dtype=x.dtype)
        dw1c, = _mm_unstack(_dotf(dzs, x, preferred_element_type=jnp.float32),
                            1, np_)                             # [hid, D]
    else:
        dw1c = _dotf(dz.T.astype(x.dtype), x,
                     preferred_element_type=jnp.float32)
    dw1_scr[:] = dw1_scr[:] + dw1c
    db1_scr[:] = db1_scr[:] + jnp.sum(dz, axis=0, keepdims=True)
    dw2_scr[:] = dw2_scr[:] + _dotf(ds[None, :], h,
                                    preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(b == n_b - 1, i == n_blocks - 1))
    def _fin():
        dw1_ref[:] = dw1_scr[:]
        db1_ref[:] = db1_scr[:]
        dw2_ref[:] = dw2_scr[:]


def _abmil_pallas_bwd(x, mask, w1, b1, w2, g, out, stats):
    B, N, D = x.shape
    hid = w1.shape[0]
    block_n = pick_block(N, x.dtype)
    n_blocks = N // block_n
    kernel = functools.partial(_abmil_bwd_kernel, n_blocks=n_blocks)
    dx, dw1, db1, dw2 = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((hid, D), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hid, D), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * D * hid,
            bytes_accessed=4 * (2 * B * N * D + 2 * B * D + hid * D),
            transcendentals=B * N * hid,
        ),
    )(x, mask.astype(jnp.float32)[:, None, :],
      w1.astype(jnp.float32), b1.astype(jnp.float32)[None, :],
      w2.astype(jnp.float32)[None, :],
      g[:, None, :].astype(jnp.float32), out[:, None, :], stats[:, None, :])
    return dx, dw1, db1[0], dw2[0]


# ---------------------------------------------------------------------------
# int8 feature storage (.q8npz): native int8 MXU kernels
#
# x_deq[n] = s[n] * x_i[n] (per-patch symmetric quantization).  Unlike the
# coattn logits, the ABMIL bottleneck is NOT scale-invariant — but the scale
# factors out of the big matmul:  h_pre[n] = s[n] * (x_i[n] @ W1^T) + b1, so
# the [bn, D] stream runs in the native int8 MXU mode (W1/g/dz quantized
# hi+lo int8 to ~15 mantissa bits, ops/coattn._mm_rows_i8) and the per-patch
# scale is applied on the [hid, bn] product.  The PV accumulation folds the
# scale into the softmax weights exactly like the coattn kernels.  dX is
# never produced: int8 storage means the pooling consumes raw stored
# features (data, not activations), so the backward writes only dW1/db1/dw2
# — saving the [B, N, D] HBM write the f32/bf16 backward pays.
# ---------------------------------------------------------------------------


def _abmil_q8_kernel(x_ref, xs_ref, mask_ref, w1_ref, b1_ref, w2_ref,
                     out_ref, stats_ref, m_scr, l_scr, acc_scr, *,
                     n_blocks: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[0, 0] = -1e30
        l_scr[0, 0] = 0.0
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0]                          # [bn, D] int8
    s_row = xs_ref[0, 0]                  # [bn] f32 dequant scales
    msk = mask_ref[0, 0]                  # [bn]
    w1 = w1_ref[:]                        # [hid, D] f32
    b1 = b1_ref[0]                        # [hid]
    w2 = w2_ref[0]                        # [hid]

    h_unit, = _stream_matmul([w1], x, transpose=True)     # [hid, bn]
    h = jnp.tanh(h_unit * s_row[None, :] + b1[:, None])
    logits = jnp.sum(h * w2[:, None], axis=0)             # [bn]
    logits = jnp.where(msk > 0, logits, -1e30)

    m_prev = m_scr[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(logits))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    p = jnp.where(msk > 0, p, 0.0)
    l_scr[0, 0] = l_scr[0, 0] * corr + jnp.sum(p)
    pv, = _stream_matmul([(p * s_row)[None, :]], x, transpose=False)  # [1, D]
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[0, 0] = m_new

    @pl.when(i == n_blocks - 1)
    def _fin():
        out_ref[0] = acc_scr[:] / jnp.maximum(l_scr[0, 0], 1e-30)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        stats_ref[0] = (jnp.where(lane == 0, m_scr[0, 0], 0.0)
                        + jnp.where(lane == 1, jnp.maximum(l_scr[0, 0], 1e-30), 0.0))


def _abmil_q8_pallas(x, x_scale, mask, w1, b1, w2):
    B, N, D = x.shape
    hid = w1.shape[0]
    block_n = pick_block(N, jnp.int8)
    assert block_n is not None
    n_blocks = N // block_n
    kernel = functools.partial(_abmil_q8_kernel, n_blocks=n_blocks)
    out, stats = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D * (hid + 1),
            bytes_accessed=B * N * D + 4 * (B * N + B * D + hid * D),
            transcendentals=B * N * (hid + 1),
        ),
    )(x, x_scale.astype(jnp.float32)[:, None, :],
      mask.astype(jnp.float32)[:, None, :],
      w1.astype(jnp.float32), b1.astype(jnp.float32)[None, :],
      w2.astype(jnp.float32)[None, :])
    return out[:, 0, :], stats


def _abmil_q8_bwd_kernel(x_ref, xs_ref, mask_ref, w1_ref, b1_ref, w2_ref,
                         g_ref, out_ref, stats_ref, dw1_ref, db1_ref, dw2_ref,
                         dw1_scr, db1_scr, dw2_scr, *, n_blocks: int):
    """Weight-grads-only streaming backward (features are data: no dX)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(0)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dw1_scr[:] = jnp.zeros_like(dw1_scr)
        db1_scr[:] = jnp.zeros_like(db1_scr)
        dw2_scr[:] = jnp.zeros_like(dw2_scr)

    x = x_ref[0]                          # [bn, D] int8
    s_row = xs_ref[0, 0]                  # [bn]
    msk = mask_ref[0, 0]                  # [bn]
    w1 = w1_ref[:]                        # [hid, D]
    b1 = b1_ref[0]
    w2 = w2_ref[0]
    g = g_ref[0]                          # [1, D]
    out = out_ref[0]                      # [1, D]
    m = stats_ref[0][0, 0]
    l = stats_ref[0][0, 1]

    # separate calls: _mm_unstack_i8 assumes equal per-matrix row counts
    h_unit, = _stream_matmul([w1], x, transpose=True)             # [hid, bn]
    gx_unit, = _stream_matmul([g], x, transpose=True)             # [1, bn]
    h = jnp.tanh(h_unit * s_row[None, :] + b1[:, None])           # [hid, bn]
    logits = jnp.sum(h * w2[:, None], axis=0)
    logits = jnp.where(msk > 0, logits, -1e30)
    a = jnp.exp(logits - m) / l
    a = jnp.where(msk > 0, a, 0.0)                                # [bn]

    gx = gx_unit[0] * s_row                                       # [bn]
    gout = jnp.sum(g[0] * out[0])
    ds = a * (gx - gout)                                          # [bn]
    dz = (w2[:, None] * ds[None, :]) * (1.0 - h * h)              # [hid, bn]

    dw1c, = _stream_matmul([dz * s_row[None, :]], x, transpose=False)  # [hid, D]
    dw1_scr[:] = dw1_scr[:] + dw1c
    db1_scr[:] = db1_scr[:] + jnp.sum(dz, axis=1)[None, :]
    dw2_scr[:] = dw2_scr[:] + _dotf(h, ds[:, None],
                                      preferred_element_type=jnp.float32).T

    @pl.when(jnp.logical_and(b == n_b - 1, i == n_blocks - 1))
    def _fin():
        dw1_ref[:] = dw1_scr[:]
        db1_ref[:] = db1_scr[:]
        dw2_ref[:] = dw2_scr[:]


def _abmil_q8_pallas_bwd(x, x_scale, mask, w1, b1, w2, g, out, stats):
    B, N, D = x.shape
    hid = w1.shape[0]
    block_n = pick_block(N, jnp.int8)
    n_blocks = N // block_n
    kernel = functools.partial(_abmil_q8_bwd_kernel, n_blocks=n_blocks)
    dw1, db1, dw2 = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hid, D), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hid, D), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hid, D), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * D * hid,
            bytes_accessed=B * N * D + 4 * (B * N + 2 * B * D + hid * D),
            transcendentals=B * N * hid,
        ),
    )(x, x_scale.astype(jnp.float32)[:, None, :],
      mask.astype(jnp.float32)[:, None, :],
      w1.astype(jnp.float32), b1.astype(jnp.float32)[None, :],
      w2.astype(jnp.float32)[None, :],
      g[:, None, :].astype(jnp.float32), out[:, None, :], stats)
    return dw1, db1[0], dw2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _abmil_pool_tpu_q8(x, x_scale, mask, w1, b1, w2):
    out, _stats = _abmil_q8_pallas(x, x_scale, mask, w1, b1, w2)
    return out


def _abmil_q8_fwd(x, x_scale, mask, w1, b1, w2):
    out, stats = _abmil_q8_pallas(x, x_scale, mask, w1, b1, w2)
    return out, (x, x_scale, mask, w1, b1, w2, out, stats)


def _abmil_q8_bwd(res, g):
    x, x_scale, mask, w1, b1, w2, out, stats = res
    dw1, db1, dw2 = _abmil_q8_pallas_bwd(
        x, x_scale, mask, w1, b1, w2, g, out, stats)
    return (None, None, None, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype))


_abmil_pool_tpu_q8.defvjp(_abmil_q8_fwd, _abmil_q8_bwd)


@jax.custom_vjp
def _abmil_pool_tpu(x, mask, w1, b1, w2):
    out, _stats = _abmil_pallas(x, mask, w1, b1, w2)
    return out


def _abmil_fwd(x, mask, w1, b1, w2):
    out, stats = _abmil_pallas(x, mask, w1, b1, w2)
    return out, (x, mask, w1, b1, w2, out, stats)


def _abmil_bwd(res, g):
    x, mask, w1, b1, w2, out, stats = res
    dx, dw1, db1, dw2 = _abmil_pallas_bwd(
        x, mask, w1, b1, w2, g, out, stats[:, 0, :])
    return dx, None, dw1.astype(w1.dtype), db1.astype(b1.dtype), dw2.astype(w2.dtype)


_abmil_pool_tpu.defvjp(_abmil_fwd, _abmil_bwd)


def abmil_pool(x, mask, w1, b1, w2, b2, use_pallas: Optional[bool] = None,
               x_scale: Optional[Array] = None):
    """Fused pooled output [B, D] (b2 is a softmax-invariant shift).

    int8 storage: pass the raw quantized features + per-patch `x_scale`;
    the native int8 kernels stream 1 byte/feature and never materialise the
    dequantized bag (weight grads only — stored features are data)."""
    if use_pallas is None:
        # same eligibility guard as coattn_pool: kernel needs a valid tile
        # for N, and the debugging knob must cover this op too — callers
        # that skip their own check fall back to the XLA reference instead
        # of tripping the kernel's block assert
        from .flags import pallas_disabled
        use_pallas = (_HAS_PALLAS and jax.default_backend() == "tpu"
                      and pick_block(x.shape[1], x.dtype) is not None
                      and not pallas_disabled())
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    if x.dtype == jnp.int8:
        assert x_scale is not None, "int8 features need per-patch x_scale"
        if use_pallas:
            return _abmil_pool_tpu_q8(x, x_scale, mask, w1, b1, w2)
        x = jax.lax.stop_gradient(dequantize_feats(x, x_scale))
        return abmil_pool_reference(x, mask, w1, b1, w2, b2)[0]
    if use_pallas:
        return _abmil_pool_tpu(x, mask, w1, b1, w2)
    return abmil_pool_reference(x, mask, w1, b1, w2, b2)[0]
