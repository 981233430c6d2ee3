"""Sequence-parallel co-attention pooling over a sharded patch axis.

For bags too long for one chip's HBM (SURVEY.md §5 long-context row): shard N
across the mesh's `model` axis and combine with flash-style partial-softmax
statistics — each device computes its shard's (m_i, l_i, PV_i) and one
all-reduce over ICI merges them:

    m = max_i m_i;  l = sum_i l_i * exp(m_i - m);  out = sum_i PV_i * exp(m_i - m) / l

P is tiny (<=16), so the collective moves only O(B*P*C) bytes — no ring pass
needed (a single psum saturates nothing).  Implemented with shard_map so the
collective placement is explicit and testable on a CPU mesh.

No reference counterpart (the reference is single-gpu, survey.md §2.8); this implements the sequence-parallel plan from survey.md §5.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.masked import l2_normalize

Array = jax.Array


def _local_partials(q, x, mask, scale):
    """Per-shard partial softmax stats over the local patch slice.

    The running max `m` cancels analytically in the final combine, so it is
    stop-gradient'ed: AD then never differentiates through max/pmax and the
    backward is the exact softmax gradient (standard flash-attention trick).
    """
    # norms accumulate in f32 regardless of the feature storage dtype —
    # bf16 sum(x*x) over C=512 carries ~0.5% error straight into every
    # logit; the fused kernels compute inv-norms in f32 (_inv_norm_row)
    # and SP must stay numerically comparable to them
    xn = l2_normalize(x.astype(jnp.float32), axis=-1)
    logits = scale * jnp.einsum("pc,bnc->bpn", q, xn)
    logits = jnp.where(mask[:, None, :], logits, -1e30)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))  # [B, P]
    p = jnp.exp(logits - m[..., None])
    p = jnp.where(mask[:, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)                           # [B, P]
    pv = jnp.einsum("bpn,bnc->bpc", p, x)             # [B, P, C]
    return m, l, pv


def coattn_pool_sp(q: Array, x: Array, mask: Optional[Array], scale,
                   mesh: Mesh, axis: str = "model",
                   batch_axis: Optional[str] = None) -> Array:
    """Sequence-parallel pooling: x [B, N, C] with N sharded over `axis`.

    `batch_axis` optionally shards B over a data-parallel mesh axis at the
    same time (the production layout: bags over `data`, patches over
    `model`); the softmax combine stays a single psum over `axis`.
    """
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)

    def shard_fn(q, x, mask):
        m, l, pv = _local_partials(q, x, mask, scale)
        m_g = jax.lax.pmax(m, axis)          # m is already stop-gradient'ed
        corr = jnp.exp(m - m_g)
        l_g = jax.lax.psum(l * corr, axis)
        pv_g = jax.lax.psum(pv * corr[..., None], axis)
        return pv_g / jnp.maximum(l_g, 1e-30)[..., None]

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None), P(batch_axis, axis)),
        out_specs=P(batch_axis, None, None),
    )
    return fn(q, x, mask)
