"""Extended MIL zoo: TransMIL, ILRA, DeepAttnMISL, PatchGCN.

Behavioural ports of ref model/deepmil.py:302-632 as masked Flax modules.
TransMIL keeps the reference's square-grid PPEG trick on the padded length;
PatchGCN implements GENConv-style softmax message passing over edge lists
with jax segment ops (the reference depends on torch_geometric).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masked import masked_mean, masked_softmax
from .layers import GatedAttentionPooling, TorchLinear
from .nystrom import NystromAttention

Array = jax.Array


class TransLayer(nn.Module):
    """LayerNorm + Nystrom attention residual (ref deepmil.py:302-324)."""
    dim: int = 512

    @nn.compact
    def __call__(self, x, mask=None, return_attn=False, train=False):
        attn_mod = NystromAttention(
            dim=self.dim, dim_head=self.dim // 8, heads=8,
            num_landmarks=self.dim // 2, pinv_iterations=6,
            residual=True, dropout=0.1, name="attn")
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if return_attn:
            out, attn = attn_mod(h, mask, return_attn=True, train=train)
            return x + out, attn
        return x + attn_mod(h, mask, train=train)


class PPEG(nn.Module):
    """Pyramid positional-encoding conv block (ref deepmil.py:327-341)."""
    dim: int = 512

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, n, C = x.shape
        cls_token, feat_token = x[:, 0], x[:, 1:]
        img = feat_token.reshape(B, H, W, C)

        def dwconv(k, name):
            kernel = self.param(
                name, jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (k, k, 1, C))
            return jax.lax.conv_general_dilated(
                img, kernel, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)

        out = dwconv(7, "proj") + img + dwconv(5, "proj1") + dwconv(3, "proj2")
        out = out.reshape(B, H * W, C)
        return jnp.concatenate([cls_token[:, None], out], axis=1)


class TransMIL(nn.Module):
    """ref deepmil.py:344-403.  Works on the padded bag length: the square
    grid is built from N_pad (the reference itself pads by duplicating
    leading tokens), and the Nystrom attention masks padded keys."""
    dim_in: int = 512
    dim_hid: int = 256
    num_cls: int = 2

    @nn.compact
    def __call__(self, X, mask=None, ret_with_attn: bool = False, train: bool = False):
        B, N, _ = X.shape
        h = nn.relu(TorchLinear(self.dim_hid, name="fc1")(X))
        _H = _W = int(math.ceil(math.sqrt(N)))
        add_length = _H * _W - N
        if add_length > 0:
            h = jnp.concatenate([h, h[:, :add_length]], axis=1)
            if mask is not None:
                mask = jnp.concatenate([mask, mask[:, :add_length]], axis=1)
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim_hid))
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim_hid)), h], axis=1)
        full_mask = None if mask is None else jnp.concatenate(
            [jnp.ones((B, 1), bool), mask], axis=1)
        h = TransLayer(self.dim_hid, name="layer1")(h, full_mask, train=train)
        h = PPEG(self.dim_hid, name="pos_layer")(h, _H, _W)
        attn = None
        if ret_with_attn:
            h, attn_full = TransLayer(self.dim_hid, name="layer2")(
                h, full_mask, return_attn=True, train=train)
            attn = jnp.mean(attn_full[:, :, 0, 1:1 + N], axis=1)  # cls->patches
        else:
            h = TransLayer(self.dim_hid, name="layer2")(h, full_mask, train=train)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)[:, 0]
        logits = TorchLinear(self.num_cls, name="fc2")(h)
        if ret_with_attn:
            return logits, attn
        return logits


class MultiHeadAttention(nn.Module):
    """ILRA attention block (ref deepmil.py:420-452): fc_q/k/v projections,
    torch-style multi-head attention, residual + relu(fc_o), optional LN and
    SiLU gate."""
    dim_v: int
    num_heads: int
    ln: bool = False
    gated: bool = False

    @nn.compact
    def __call__(self, Q_in, K_in, key_mask: Optional[Array] = None):
        d = self.dim_v
        Q = TorchLinear(d, name="fc_q")(Q_in)
        K = TorchLinear(d, name="fc_k")(K_in)
        V = TorchLinear(d, name="fc_v")(K_in)
        B, Lq, _ = Q.shape
        Lk = K.shape[1]
        hd = d // self.num_heads
        # torch nn.MultiheadAttention: separate in/out projections
        in_w = self.param("in_proj", nn.initializers.xavier_uniform(), (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = Q @ in_w[:d].T + in_b[:d]
        k = K @ in_w[d:2 * d].T + in_b[d:2 * d]
        v = V @ in_w[2 * d:].T + in_b[2 * d:]

        def heads(t, L):
            return t.reshape(B, L, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q, Lq), heads(k, Lk), heads(v, Lk)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        km = None if key_mask is None else key_mask[:, None, None, :]
        attn = masked_softmax(logits, km, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, d)
        out = TorchLinear(d, name="out_proj")(out)

        O = Q + out
        if self.ln:
            O = nn.LayerNorm(epsilon=1e-5, name="ln0")(O)
        O = O + nn.relu(TorchLinear(d, name="fc_o")(O))
        if self.ln:
            O = nn.LayerNorm(epsilon=1e-5, name="ln1")(O)
        if self.gated:
            gate = nn.silu(TorchLinear(d, name="gate")(Q_in))
            O = O * gate
        return O


class GAB(nn.Module):
    """Global attention bottleneck block (ref deepmil.py:455-479)."""
    dim_in: int
    dim_out: int
    num_heads: int
    num_inds: int
    ln: bool = False

    @nn.compact
    def __call__(self, X, mask=None):
        B = X.shape[0]
        latent = self.param("latent", nn.initializers.xavier_uniform(),
                            (1, self.num_inds, self.dim_out))
        latent = jnp.broadcast_to(latent, (B, self.num_inds, self.dim_out))
        H = MultiHeadAttention(self.dim_out, self.num_heads, ln=self.ln, gated=True,
                               name="project_forward")(latent, X, key_mask=mask)
        X_hat = MultiHeadAttention(self.dim_out, self.num_heads, ln=self.ln, gated=True,
                                   name="project_backward")(X, H)
        return X_hat


class ILRA(nn.Module):
    """Iterative low-rank attention MIL (ref deepmil.py:500-535)."""
    dim_in: int = 512
    dim_hid: int = 256
    num_cls: int = 2
    num_layers: int = 2
    num_heads: int = 8
    topk: int = 1
    ln: bool = False

    @nn.compact
    def __call__(self, X, mask=None, train: bool = False, **_):
        for idx in range(self.num_layers):
            X = GAB(self.dim_in if idx == 0 else self.dim_hid, self.dim_hid,
                    self.num_heads, self.topk, ln=self.ln, name=f"gab_{idx}")(
                        X, mask if idx == 0 else mask)
        B = X.shape[0]
        seeds = self.param("pool_seeds", nn.initializers.xavier_uniform(),
                           (1, self.topk, self.dim_hid))
        seeds = jnp.broadcast_to(seeds, (B, self.topk, self.dim_hid))
        feat = MultiHeadAttention(self.dim_hid, self.num_heads, ln=self.ln,
                                  name="pooling")(seeds, X, key_mask=mask)
        logits = TorchLinear(self.num_cls, name="classifier")(feat)
        return logits[:, 0]


class DeepAttnMISL(nn.Module):
    """Cluster-constrained MIL (ref deepmil.py:542-580): per-cluster FC+ReLU
    + mean pooling, gated attention over cluster embeddings."""
    dim_in: int = 512
    dim_hid: int = 256
    num_cls: int = 1
    num_clusters: int = 8
    dropout: float = 0.25

    @nn.compact
    def __call__(self, X, mask=None, cluster_id=None, train: bool = False, **_):
        # X [B, N, D]; cluster_id [B, N] ints in [0, num_clusters)
        assert cluster_id is not None, "DeepAttnMISL requires cluster ids."
        h = nn.relu(TorchLinear(self.dim_hid, name="phis")(X))  # [B, N, d']
        onehot = jax.nn.one_hot(cluster_id, self.num_clusters, dtype=h.dtype)  # [B, N, K]
        if mask is not None:
            onehot = onehot * mask[..., None]
        counts = jnp.sum(onehot, axis=1)                         # [B, K]
        sums = jnp.einsum("bnk,bnd->bkd", onehot, h)
        cluster_feat = sums / jnp.maximum(counts[..., None], 1.0)  # zeros if empty
        a_in = nn.relu(TorchLinear(self.dim_hid, name="attn_fc")(cluster_feat))
        a_in = nn.Dropout(self.dropout, deterministic=not train)(a_in)
        pooled, _ = GatedAttentionPooling(self.dim_hid, dropout=self.dropout,
                                          name="attention_net")(a_in, None, train=train)
        return TorchLinear(self.num_cls, name="output_layer")(pooled)


class GENConvLayer(nn.Module):
    """GENConv-style message passing with softmax aggregation
    (behavioural equivalent of torch_geometric GENConv used at ref
    deepmil.py:585-632; messages relu(x_j)+eps, per-node softmax(t*m)
    weighting, 2-layer MLP update)."""
    dim: int
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_valid):
        # x [N, D]; edges src->dst aggregated at dst
        N = x.shape[0]
        t = self.param("t", nn.initializers.ones, ())
        msg = nn.relu(x[edge_src]) + self.eps                       # [E, D]
        logits = t * msg
        logits = jnp.where(edge_valid[:, None], logits, -1e30)
        seg_max = jax.ops.segment_max(logits, edge_dst, num_segments=N)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        expv = jnp.exp(logits - seg_max[edge_dst]) * edge_valid[:, None]
        denom = jax.ops.segment_sum(expv, edge_dst, num_segments=N)
        w = expv / jnp.maximum(denom[edge_dst], 1e-16)
        aggr = jax.ops.segment_sum(w * msg, edge_dst, num_segments=N)
        h = x + aggr
        h = TorchLinear(2 * self.dim, name="mlp1")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(h)
        h = nn.relu(h)
        h = TorchLinear(self.dim, name="mlp2")(h)
        return h


class PatchGCN(nn.Module):
    """Graph MIL over patch adjacency (ref deepmil.py:588-632): GENConv-style
    layers with dense residual concatenation, gated-attention readout."""
    dim_in: int = 512
    dim_hid: int = 128
    num_cls: int = 4
    num_layers: int = 3
    dropout: float = 0.25

    @nn.compact
    def __call__(self, X, edge_index, mask=None, edge_valid=None,
                 train: bool = False, **_):
        # single-graph form: X [N, D], edge_index [2, E]
        squeeze = X.ndim == 2
        assert squeeze, "PatchGCN operates on a single graph [N, D]."
        edge_src, edge_dst = edge_index[0], edge_index[1]
        if edge_valid is None:
            edge_valid = jnp.ones(edge_src.shape, bool)
        x = nn.relu(TorchLinear(self.dim_hid, name="fc")(X))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x_cat = [x]
        h = GENConvLayer(self.dim_hid, name="conv0")(x, edge_src, edge_dst, edge_valid)
        x_cat.append(h)
        for i in range(1, self.num_layers):
            hn = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(h)
            hn = nn.relu(hn)
            hn = nn.Dropout(0.1, deterministic=not train)(hn)
            h = h + GENConvLayer(self.dim_hid, name=f"conv{i}")(
                hn, edge_src, edge_dst, edge_valid)
            x_cat.append(h)
        h_path = jnp.concatenate(x_cat, axis=1)
        h_path = nn.relu(TorchLinear(self.dim_hid, name="path_phi")(h_path))
        h_path = nn.Dropout(self.dropout, deterministic=not train)(h_path)
        pooled, _ = GatedAttentionPooling(self.dim_hid, dropout=self.dropout,
                                          name="path_attention_head")(
                                              h_path[None], None if mask is None else mask[None],
                                              train=train)
        return TorchLinear(self.num_cls, name="output_layer")(pooled)


def BatchedPatchGCN(**kwargs):
    """vmap PatchGCN over a batch of padded graphs: X [B, N, D],
    edge_index [B, 2, E], mask [B, N], edge_valid [B, E] -> [B, num_cls]."""
    Vm = nn.vmap(
        PatchGCN,
        in_axes=(0, 0, 0, 0),
        out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False, "dropout": True},
        methods=["__call__"],
    )

    class _Wrapper(nn.Module):
        @nn.compact
        def __call__(self, X, mask=None, edge_index=None, edge_valid=None,
                     train: bool = False, **_):
            assert edge_index is not None, "PatchGCN requires edge_index."
            if mask is None:
                mask = jnp.ones(X.shape[:2], bool)
            if edge_valid is None:
                edge_valid = jnp.ones(edge_index.shape[::2], bool)
            out = Vm(**kwargs, name="gcn")(X, edge_index, mask, edge_valid)
            return out[:, 0]  # [B, 1, num_cls] -> [B, num_cls]

    return _Wrapper()
