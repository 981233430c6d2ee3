"""Fused ABMIL attention pooling — the SA-family hot op.

The ABMIL head computes per-patch scores through a tanh bottleneck and
softmax-pools the bag (ref model/layers.py:125-153):

    a_n = w2 . tanh(W1 x_n + b1) + b2;   out = sum_n softmax(a)_n * x_n

On TPU the [B, N, hid] tanh intermediate dominates HBM traffic; the Pallas
kernel streams X once per bag, computing the projection, the masked online
softmax, and the weighted-sum accumulation in VMEM.  Backward recomputes
through the XLA reference (the output is only [B, D]).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .masked import masked_softmax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

Array = jax.Array

_BLOCK_N = int(os.environ.get("VLSA_TPU_ABMIL_BLOCK_N", "256"))


def pick_block(N: int):
    """Largest 128-aligned tile from {_BLOCK_N, 512, 256, 128} dividing N."""
    for b in (_BLOCK_N, 2048, 1024, 512, 256, 128):
        b = min(b, N)
        if b % 128 == 0 and N % b == 0:
            return b
    return None
INTERPRET = False


def abmil_pool_reference(x, mask, w1, b1, w2, b2):
    """x [B,N,D]; w1 [hid,D]; b1 [hid]; w2 [hid]; b2 scalar -> (out [B,D], raw [B,N])."""
    h = jnp.tanh(jnp.einsum("bnd,hd->bnh", x, w1) + b1)
    raw = jnp.einsum("bnh,h->bn", h, w2) + b2
    attn = masked_softmax(raw, mask, axis=-1)
    return jnp.einsum("bn,bnd->bd", attn, x), raw


def _abmil_kernel(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, out_ref,
                  m_scr, l_scr, acc_scr, *, n_blocks: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[0, 0] = -1e30
        l_scr[0, 0] = 0.0
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0].astype(jnp.float32)      # [bn, D]
    msk = mask_ref[0, 0]                  # [bn]
    w1 = w1_ref[:]                        # [hid, D]
    b1 = b1_ref[0]                        # [hid] (stored [1, hid])
    w2 = w2_ref[0]                        # [hid]

    h = jnp.tanh(jnp.dot(x, w1.T, preferred_element_type=jnp.float32) + b1[None, :])
    logits = jnp.sum(h * w2[None, :], axis=-1)           # [bn] (b2 cancels in softmax)
    logits = jnp.where(msk > 0, logits, -1e30)

    m_prev = m_scr[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(logits))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    p = jnp.where(msk > 0, p, 0.0)
    l_scr[0, 0] = l_scr[0, 0] * corr + jnp.sum(p)
    acc_scr[:] = acc_scr[:] * corr + jnp.dot(
        p[None, :], x, preferred_element_type=jnp.float32)  # [1, D]
    m_scr[0, 0] = m_new

    @pl.when(i == n_blocks - 1)
    def _fin():
        out_ref[0] = acc_scr[:] / jnp.maximum(l_scr[0, 0], 1e-30)


def _abmil_pallas(x, mask, w1, b1, w2):
    B, N, D = x.shape
    hid = w1.shape[0]
    block_n = pick_block(N)
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
        out_specs=pl.BlockSpec((1, 1, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
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
    return out[:, 0, :]


@jax.custom_vjp
def _abmil_pool_tpu(x, mask, w1, b1, w2):
    return _abmil_pallas(x, mask, w1, b1, w2)


def _abmil_fwd(x, mask, w1, b1, w2):
    return _abmil_pallas(x, mask, w1, b1, w2), (x, mask, w1, b1, w2)


def _abmil_bwd(res, g):
    x, mask, w1, b1, w2 = res
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_: abmil_pool_reference(x_, mask, w1_, b1_, w2_, 0.0)[0],
        x, w1, b1, w2)
    dx, dw1, db1, dw2 = vjp(g)
    return dx, None, dw1, db1, dw2


_abmil_pool_tpu.defvjp(_abmil_fwd, _abmil_bwd)


def abmil_pool(x, mask, w1, b1, w2, b2, use_pallas: Optional[bool] = None):
    """Fused pooled output [B, D] (b2 is a softmax-invariant shift)."""
    if use_pallas is None:
        use_pallas = _HAS_PALLAS and jax.default_backend() == "tpu"
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    if use_pallas:
        return _abmil_pool_tpu(x, mask, w1, b1, w2)
    return abmil_pool_reference(x, mask, w1, b1, w2, b2)[0]
