"""MIL encoder zoo (core): VLFAN, ABMIL/DeepMIL, Feat/Max/Mean MIL, DSMIL.

Behavioural ports of ref model/deepmil.py as masked, batched Flax modules.
Every module takes `(X [B, N, D], mask [B, N])` — the TPU-first ragged-bag
convention — instead of the reference's batch-size-1 unpadded tensors.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coattn import coattn_attention_reference, coattn_pool
from ..ops.masked import (
    l2_normalize,
    masked_max,
    masked_mean,
    masked_softmax,
    masked_topk_mean,
)
from .layers import (
    Adapter,
    AttentionPooling,
    FeatProjecter,
    GatedAttentionPooling,
    TorchLinear,
)

Array = jax.Array


def logit_pooling(logits: Array, method: str, mask: Optional[Array] = None):
    """MI-Zero aggregation of per-patch logits (ref model/deepmil.py:16-37).

    logits [N, C] or [B, N, C]; returns (preds, pooled_logits [.., C]).
    """
    if method[:9] in ("logit_max", "logit_top"):
        topk = 1 if method == "logit_max" else int(method.split("top")[-1])
        pooled = masked_topk_mean(logits, mask, topk)
    elif method == "logit_mean":
        pooled = masked_mean(logits, mask, axis=-2)
    else:
        raise NotImplementedError(f"The pooling ({method}) is not implemented.")
    preds = jnp.argmax(pooled, axis=-1)
    return preds, pooled


class FeatMIL(nn.Module):
    """Aggregation-only network for zero-shot mode (ref model/deepmil.py:40-67).

    pooling='mean'/'max' -> [B, D]; otherwise identity: returns the per-patch
    features [B, N, D] (logit pooling then happens on per-patch logits).
    """
    pooling: str = "mean"

    @nn.compact
    def __call__(self, X, mask=None, **_):
        if self.pooling == "mean":
            return masked_mean(X, mask, axis=1)
        if self.pooling == "max":
            return masked_max(X, mask, axis=1)
        return X


class VLFAN(nn.Module):
    """Language-guided visual feature aggregation network
    (ref model/deepmil.py:74-215).

    P text-derived (or learned) queries cross-attend the patch bag:
        A = softmax_N(coattn_scale * norm(Q) @ norm(X)^T);  out = A @ X
    then query pooling (mean/max/weight/attention) and a linear adapter.
    The attention+PV runs through the fused Pallas kernel on TPU.

    When `query='Text'` the caller passes the query matrix (computed by a
    PromptAdapter over frozen prognostic-prior text features) via `query=`.
    """
    dim_in: int = 1024
    dim_hid: int = 256
    use_feat_proj: bool = True
    drop_rate: float = 0.25
    query: str = "Parameter"
    num_query: int = 10
    gated_query: bool = False
    query_pooling: str = "mean"
    pred_head: str = "default"
    coattn_logit_scale_init: float = float(np.log(100.0))
    # sequence-parallel routing: when `sp_mesh` is set, the co-attention pool
    # runs through parallel.coattn_pool_sp — patches sharded over `sp_axis`,
    # bags over `dp_axis`, partial-softmax combined with one psum over ICI
    # (SURVEY.md §5 long-context row).  Set by the runner when the config
    # mesh enables seq_parallel.
    sp_mesh: Any = None
    sp_axis: str = "model"
    dp_axis: Optional[str] = "data"

    def setup(self):
        if self.use_feat_proj:
            self.feat_proj = FeatProjecter(self.dim_in)
        if self.query == "Parameter":
            n_q = self.num_query + 1 if self.gated_query else self.num_query
            self.Q = self.param("Q", nn.initializers.normal(1.0), (n_q, self.dim_in))
        if self.query_pooling == "attention":
            self.query_pool = AttentionPooling(self.dim_hid)
        elif self.query_pooling == "gated_attention":
            self.query_pool = GatedAttentionPooling(self.dim_hid, dropout=self.drop_rate)
        elif self.query_pooling == "weight":
            self.query_pool_weight = self.param(
                "query_pool_weight", nn.initializers.normal(1.0), (1, self.num_query))
        if self.pred_head != "Identity":
            self.visual_adapter = TorchLinear(self.dim_in, name="visual_adapter")

    @property
    def coattn_logit_scale(self) -> float:
        # fixed (non-trainable) scale, ref deepmil.py:121-126
        return float(np.exp(self.coattn_logit_scale_init))

    def get_query(self, query: Optional[Array] = None) -> Array:
        if self.query == "Parameter":
            return self.Q
        assert query is not None, "Text query must be provided for query='Text'."
        return query

    def effective_query(self, query: Optional[Array] = None) -> Array:
        """Normalise and (for gated mode) fold the gate query into each row —
        gating is linear in the normalised queries, so the fused kernel sees a
        single [P, C] matrix."""
        Q = self.get_query(query)
        Qn = l2_normalize(Q, axis=-1)
        if self.gated_query:
            Qn = Qn[:-1] - Qn[-1:]
        return Qn

    def query_div_loss(self, query: Optional[Array] = None, last_div: bool = True, **_):
        """Prompt-diversity regulariser (ref deepmil.py:157-168)."""
        Q = self.get_query(query)
        nq = l2_normalize(Q, axis=-1)
        P = Q.shape[0]
        if P == self.num_query + 1 and last_div:
            sim = nq[-1:] @ nq[:-1].T
            return jnp.mean(jnp.abs(sim))
        sim = nq @ nq.T
        off = ~jnp.eye(P, dtype=bool)
        return jnp.sum(jnp.abs(sim) * off) / jnp.maximum(off.sum(), 1)

    def forward_query_pooling(self, out: Array, train: bool = False):
        """[B, P, C] -> [B, C] (ref deepmil.py:133-150)."""
        if self.query_pooling == "mean":
            return jnp.mean(out, axis=1), None
        if self.query_pooling == "max":
            return jnp.max(out, axis=1), None
        if self.query_pooling == "weight":
            w = jax.nn.softmax(self.query_pool_weight, axis=-1)  # [1, P]
            return jnp.einsum("qp,bpc->bc", w, out), None
        if self.query_pooling == "attention":
            return self.query_pool(out, None)
        if self.query_pooling == "gated_attention":
            return self.query_pool(out, None, train=train)
        raise ValueError(self.query_pooling)

    def __call__(self, X, mask=None, query: Optional[Array] = None,
                 ret_with_attn: bool = False, train: bool = False,
                 x_scale: Optional[Array] = None,
                 x_inv: Optional[Array] = None):
        if self.use_feat_proj or self.sp_mesh is not None:
            # quantized/normed sidecars describe the STORED features; any
            # transform of X first (projecter) or the shard_map pool (sp)
            # invalidates them — dequantize int8 to bf16 and drop the rows
            if X.dtype == jnp.int8:
                from ..ops.coattn import dequantize_feats
                X = dequantize_feats(X, x_scale).astype(jnp.bfloat16)
            x_scale = x_inv = None
        if self.use_feat_proj:
            in_dtype = X.dtype
            X = self.feat_proj(X)
            if in_dtype == jnp.bfloat16:
                # bf16 storage opts into mixed precision: projected
                # activations stay bf16 so the fused kernels stream the
                # MXU's native dtype (incl. the dX write)
                X = X.astype(jnp.bfloat16)
        q_eff = self.effective_query(query)
        scale = self.coattn_logit_scale
        if self.sp_mesh is not None:
            from ..parallel.coattn_sp import coattn_pool_sp
            x_in = X if self.use_feat_proj else jax.lax.stop_gradient(X)
            out = coattn_pool_sp(q_eff, x_in, mask, scale, self.sp_mesh,
                                 axis=self.sp_axis, batch_axis=self.dp_axis)
        else:
            # without a feat projecter nothing learnable feeds X -> declare it
            # constant so the backward runs the dQ-only kernel (no dX write)
            out = coattn_pool(q_eff, X, mask, scale,
                              x_stop_gradient=not self.use_feat_proj,
                              x_scale=x_scale, x_inv=x_inv)  # [B, P, C]
        pooled, pooled_ext = self.forward_query_pooling(out, train=train)
        feats = self.visual_adapter(pooled) if self.pred_head != "Identity" else pooled
        if ret_with_attn:
            A = coattn_attention_reference(q_eff, X, mask, scale,
                                           x_scale=x_scale)  # [B, P, N]
            attn = (A, pooled_ext) if pooled_ext is not None else A
            return feats, attn
        return feats


class DeepMIL(nn.Module):
    """ABMIL-family bag classifier (ref model/deepmil.py:222-292)."""
    dim_in: int = 1024
    dim_hid: int = 256
    num_cls: int = 2
    use_feat_proj: bool = True
    drop_rate: float = 0.25
    pooling: str = "attention"
    pred_head: str = "default"
    dim_reduction: int = 4
    keep_ratio: float = 0.8

    accepts_x_scale = True
    # sequence-parallel routing (parallel.abmil_sp): patches sharded over
    # `sp_axis`, bags over `dp_axis`, one partial-softmax psum
    sp_mesh: Any = None
    sp_axis: str = "model"
    dp_axis: Optional[str] = "data"

    @nn.compact
    def __call__(self, X, mask=None, ret_with_attn: bool = False, train: bool = False,
                 x_scale=None, x_inv=None):
        assert self.pooling in ("mean", "max", "attention", "gated_attention")
        assert self.pred_head in ("default", "Adapter")
        del x_inv  # unnormalised pooling: the 1/l2norm sidecar is unused
        if X.dtype == jnp.int8 and (self.use_feat_proj
                                    or self.sp_mesh is not None
                                    or self.pooling != "attention"):
            # the int8 fast path exists only for raw-feature attention
            # pooling (ops/abmil q8 kernels); anything transforming X first
            # consumes dequantized features
            from ..ops.coattn import dequantize_feats
            X = dequantize_feats(X, x_scale).astype(jnp.bfloat16)
            x_scale = None
        if self.use_feat_proj:
            in_dtype = X.dtype
            X = FeatProjecter(self.dim_in, name="feat_proj")(X)
            if in_dtype == jnp.bfloat16:
                # bf16 feature storage opts into mixed precision: keep the
                # projected activations bf16 so the fused ABMIL kernels
                # stream the MXU's native dtype (ops/abmil._h_matmul)
                X = X.astype(jnp.bfloat16)
        raw_attn = None
        if self.pooling == "mean":
            out_feat = masked_mean(X, mask, axis=1)
        elif self.pooling == "max":
            out_feat = masked_max(X, mask, axis=1)
        elif self.pooling == "attention":
            x_in = X
            if self.sp_mesh is not None and not self.use_feat_proj:
                # raw stored features are data: skip the dX path entirely
                x_in = jax.lax.stop_gradient(X)
            out_feat, raw_attn = AttentionPooling(
                self.dim_hid, name="sigma", sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis, dp_axis=self.dp_axis)(
                x_in, mask, need_attn=ret_with_attn, x_scale=x_scale)
        else:
            out_feat, raw_attn = GatedAttentionPooling(
                self.dim_hid, dropout=self.drop_rate, name="sigma")(X, mask, train=train)
        if self.pred_head == "Adapter":
            adapted = Adapter(self.dim_in, self.dim_reduction, name="visual_adapter")(out_feat)
            logit = self.keep_ratio * out_feat + (1 - self.keep_ratio) * adapted
        else:
            logit = TorchLinear(self.num_cls, name="g")(out_feat)
        if ret_with_attn:
            return logit, raw_attn
        return logit


def MaxMIL(**kws):
    kws.pop("pooling", None)
    return DeepMIL(pooling="max", **kws)


def MeanMIL(**kws):
    kws.pop("pooling", None)
    return DeepMIL(pooling="mean", **kws)


class DSMIL(nn.Module):
    """Dual-stream MIL (ref model/deepmil.py:638-721)."""
    dim_in: int = 1024
    dim_hid: int = 256
    num_cls: int = 2
    use_feat_proj: bool = True
    drop_rate: float = 0.25

    @nn.compact
    def __call__(self, X, mask=None, ret_with_attn: bool = False, train: bool = False):
        if self.use_feat_proj:
            X = FeatProjecter(self.dim_in, name="feat_proj")(X)
        B, N, D = X.shape
        # instance classifier
        classes = TorchLinear(self.num_cls, name="i_fc")(X)          # [B, N, C]
        # critical instance per class (masked argmax over N)
        cls_logits = classes if mask is None else jnp.where(
            mask[..., None], classes, -1e30)
        crit_idx = jnp.argmax(cls_logits, axis=1)                     # [B, C]
        m_feats = jnp.take_along_axis(X, crit_idx[..., None], axis=1)  # [B, C, D]
        q_layer = TorchLinear(self.dim_hid, name="q")
        q = q_layer(X)                                                # [B, N, Dq]
        v_in = nn.Dropout(self.drop_rate, deterministic=not train)(X)
        v = TorchLinear(self.dim_hid, name="v")(v_in)                 # [B, N, Dv]
        q_max = q_layer(m_feats)                                      # shared weights
        A_logits = jnp.einsum("bnq,bcq->bnc", q, q_max) / jnp.sqrt(float(self.dim_hid))
        A = masked_softmax(A_logits, None if mask is None else mask[..., None], axis=1)
        B_mat = jnp.einsum("bnc,bnv->bcv", A, v)                      # [B, C, Dv]
        # conv1d(C, C, kernel=Dv): cross-class mixing (ref deepmil.py:671,687)
        fcc_kernel = self.param(
            "fcc_kernel",
            jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.num_cls, self.num_cls, self.dim_hid))
        fcc_bias = self.param("fcc_bias", nn.initializers.zeros, (self.num_cls,))
        bag_pred = jnp.einsum("bcv,ocv->bo", B_mat, fcc_kernel) + fcc_bias  # [B, C]
        max_pred = masked_max(classes, mask, axis=1)                  # [B, C]
        logits = 0.5 * (bag_pred + max_pred)
        if ret_with_attn:
            attn = jnp.mean(A, axis=-1)                               # [B, N]
            return logits, attn
        return logits
