"""Fused masked cross-attention pooling — the hot op of the framework.

The language-guided aggregator reduces a bag of N patch features (N up to
tens of thousands) against P<=16 text-derived queries:

    Xn = l2norm(X);  A = softmax_N(scale * Q @ Xn^T);  out = A @ X

(ref: model/deepmil.py:185-204 — computed there as three separate torch ops
materialising the [P, N] attention matrix in HBM).

TPU-first design: a Pallas kernel streams X through VMEM once per bag,
computing the row norms, the scaled logits, an online (flash-style) softmax
over N-blocks, and the PV accumulation in a single pass — nothing of size
O(N) is ever written back to HBM.  The backward pass recomputes through the
jnp reference implementation (cheap: P is tiny), keeping gradients exact.

`coattn_pool` is the public entry: Pallas on TPU, jnp elsewhere.
"""
from __future__ import annotations

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

_BLOCK_N = 256


def coattn_pool_reference(q: Array, x: Array, mask: Optional[Array], scale) -> Array:
    """Pure-XLA reference: q [P, C] (pre-normalised/gated), x [B, N, C],
    mask [B, N] (bool) -> out [B, P, C]."""
    xn = l2_normalize(x, axis=-1)
    logits = scale * jnp.einsum("pc,bnc->bpn", q, xn)
    m = None if mask is None else mask[:, None, :]
    attn = masked_softmax(logits, m, axis=-1)
    return jnp.einsum("bpn,bnc->bpc", attn, x)


def coattn_attention_reference(q: Array, x: Array, mask: Optional[Array], scale) -> Array:
    """Return the attention matrix [B, P, N] (interpretation path)."""
    xn = l2_normalize(x, axis=-1)
    logits = scale * jnp.einsum("pc,bnc->bpn", q, xn)
    m = None if mask is None else mask[:, None, :]
    return masked_softmax(logits, m, axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _coattn_kernel(q_ref, x_ref, mask_ref, scale_ref, out_ref,
                   m_scr, l_scr, acc_scr, *, block_n: int, n_blocks: int):
    """One (batch, n-block) grid step of the fused pass.

    Scratch m/l/acc persist across the sequential N-block dimension:
      m [P, 1] running max, l [P, 1] running sum, acc [P, C] running PV.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]                      # [P, C]
    x = x_ref[0]                      # [block_n, C]
    msk = mask_ref[0, 0]              # [block_n]
    scale = scale_ref[0, 0]

    # row-normalise the patch block (rsqrt on VPU), fused with the logits
    sq = jnp.sum(x * x, axis=-1, keepdims=True)          # [bn, 1]
    inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))          # [bn, 1]
    xn = x * inv
    logits = scale * jnp.dot(q, xn.T, preferred_element_type=jnp.float32)  # [P, bn]
    logits = jnp.where(msk[None, :] > 0, logits, -1e30)

    m_prev = m_scr[:]                                     # [P, 1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                           # [P, bn]
    p = jnp.where(msk[None, :] > 0, p, 0.0)
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jnp.dot(
        p, x, preferred_element_type=jnp.float32)         # [P, C] (PV uses raw x)
    m_scr[:] = m_new

    @pl.when(i == n_blocks - 1)
    def _finalize():
        out_ref[0] = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)


def _coattn_pallas(q: Array, x: Array, mask: Array, scale: Array) -> Array:
    B, N, C = x.shape
    P = q.shape[0]
    block_n = min(_BLOCK_N, N)
    assert N % block_n == 0, f"bag length {N} must be a multiple of {block_n}"
    n_blocks = N // block_n
    # pad P up to the f32 sublane count so the [P, C] tiles are well-formed
    P_pad = max(8, int(np.ceil(P / 8)) * 8)
    if P_pad != P:
        q = jnp.pad(q, ((0, P_pad - P), (0, 0)))

    kernel = functools.partial(_coattn_kernel, block_n=block_n, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((P_pad, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            # mask rides as [B, 1, N] so the block tile (1, 1, block_n)
            # satisfies TPU (sublane, lane) constraints
            pl.BlockSpec((1, 1, block_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, P_pad, C), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P_pad, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P_pad, 1), jnp.float32),
            pltpu.VMEM((P_pad, 1), jnp.float32),
            pltpu.VMEM((P_pad, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * (P_pad + 1) + 2 * B * P_pad * N * C,
            bytes_accessed=4 * (B * N * C + B * P_pad * C + P_pad * C),
            transcendentals=B * P_pad * N,
        ),
    )(q.astype(jnp.float32), x.astype(jnp.float32),
      mask.astype(jnp.float32)[:, None, :],
      jnp.asarray(scale, jnp.float32).reshape(1, 1))
    return out[:, :P, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _coattn_pool_tpu(q, x, mask, scale):
    return _coattn_pallas(q, x, mask, scale)


def _coattn_fwd(q, x, mask, scale):
    return _coattn_pallas(q, x, mask, scale), (q, x, mask, scale)


def _coattn_bwd(res, g):
    q, x, mask, scale = res
    # exact gradients by recomputation through the XLA reference path;
    # the recompute is one extra streaming pass over X
    _, vjp = jax.vjp(lambda q_, x_, s_: coattn_pool_reference(q_, x_, mask, s_), q, x, scale)
    dq, dx, ds = vjp(g)
    return dq, dx, None, ds


_coattn_pool_tpu.defvjp(_coattn_fwd, _coattn_bwd)


def coattn_pool(q: Array, x: Array, mask: Optional[Array], scale,
                use_pallas: Optional[bool] = None) -> Array:
    """Fused masked cross-attention pooling.

    q [P, C] effective queries (already l2-normalised and gate-combined),
    x [B, N, C] raw patch features, mask [B, N] validity, scale scalar.
    Returns [B, P, C].
    """
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() == "tpu"
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    if use_pallas:
        return _coattn_pool_tpu(q, x, mask, jnp.asarray(scale, jnp.float32))
    return coattn_pool_reference(q, x, mask, scale)
