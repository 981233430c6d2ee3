"""Shared Flax layers for the MIL zoo.

Behavioural ports of ref model/layers.py as masked, batched linen modules.
Initialisers mirror torch defaults (Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in)))
so trained-from-scratch behaviour tracks the reference.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masked import masked_mean, masked_softmax

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on the kernel and
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias — both reduce to bound
# 1/sqrt(fan_in), i.e. variance_scaling(1/3, fan_in, uniform).
torch_linear_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Dense with torch-default initialisation."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s: torch_bias_init(k, s, fan_in=fan_in), (self.features,))
            y = y + bias
        return y


class Adapter(nn.Module):
    """Bottleneck MLP adapter (ref model/layers.py:50-62)."""
    dim: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        h = TorchLinear(self.dim // self.reduction, use_bias=False, name="fc1")(x)
        h = nn.relu(h)
        h = TorchLinear(self.dim, use_bias=False, name="fc2")(h)
        return nn.relu(h)


class FeatProjecter(nn.Module):
    """Linear + LayerNorm projector (ref model/layers.py:65-82)."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.out_dim, name="linear")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class AttentionPooling(nn.Module):
    """ABMIL global attention pooling (ref model/layers.py:125-153).

    x [B, N, D], mask [B, N] -> (pooled [B, D], raw attention logits [B, N]).
    On TPU with `need_attn=False` the pooled output runs through the fused
    Pallas kernel (ops/abmil.py) and the [B, N, hid] intermediate never
    touches HBM; `need_attn=True` takes the explicit path.  With `sp_mesh`
    set, the pool runs the explicit sequence-parallel shard_map path
    (parallel.abmil_sp): patches sharded over `sp_axis`, bags over
    `dp_axis`, one partial-softmax psum over ICI.
    """
    hid_dim: int = 512
    sp_mesh: Optional[object] = None
    sp_axis: str = "model"
    dp_axis: Optional[str] = "data"

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, ret_raw_attn: bool = True,
                 need_attn: bool = True, x_scale: Optional[jax.Array] = None):
        D = x.shape[-1]
        k1 = self.param("fc1_kernel", torch_linear_init, (D, self.hid_dim))
        b1 = self.param("fc1_bias",
                        lambda k, s: torch_bias_init(k, s, fan_in=D), (self.hid_dim,))
        k2 = self.param("fc2_kernel", torch_linear_init, (self.hid_dim, 1))
        b2 = self.param("fc2_bias",
                        lambda k, s: torch_bias_init(k, s, fan_in=self.hid_dim), (1,))
        from ..ops import abmil as _abmil
        from vlsa_tpu.ops.abmil import pick_block
        import os as _os
        if self.sp_mesh is not None and x.ndim == 3 and not need_attn:
            from ..parallel.abmil_sp import abmil_pool_sp
            pooled = abmil_pool_sp(x, mask, k1.T, b1, k2[:, 0], self.sp_mesh,
                                   axis=self.sp_axis, batch_axis=self.dp_axis)
            return pooled, None
        from ..ops.flags import pallas_disabled
        fused_ok = (x.ndim == 3 and not need_attn and x.shape[1] >= 256
                    and pick_block(x.shape[1], x.dtype) is not None
                    and not pallas_disabled())
        if fused_ok:
            pooled = _abmil.abmil_pool(x, mask, k1.T, b1, k2[:, 0], b2[0],
                                       x_scale=x_scale)
            return pooled, None
        if x.dtype == jnp.int8:
            from ..ops.coattn import dequantize_feats
            x = jax.lax.stop_gradient(dequantize_feats(x, x_scale))
        h = nn.tanh(x @ k1 + b1)
        a_raw = (h @ k2)[..., 0] + b2[0]  # [B, N]
        attn = masked_softmax(a_raw, mask, axis=-1)
        pooled = jnp.einsum("bn,bnd->bd", attn, x)
        return pooled, (a_raw if ret_raw_attn else attn)


class GatedAttentionPooling(nn.Module):
    """Gated ABMIL pooling (ref model/layers.py:85-122)."""
    hid_dim: int = 512
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, ret_raw_attn: bool = False,
                 train: bool = False):
        emb = nn.tanh(TorchLinear(self.hid_dim, name="fc1")(x))
        emb = nn.Dropout(self.dropout, deterministic=not train)(emb)
        scr = nn.sigmoid(TorchLinear(self.hid_dim, name="score")(x))
        scr = nn.Dropout(self.dropout, deterministic=not train)(scr)
        a_raw = TorchLinear(1, name="fc2")(emb * scr)[..., 0]  # [B, N]
        attn = masked_softmax(a_raw, mask, axis=-1)
        pooled = jnp.einsum("bn,bnd->bd", attn, x)
        return pooled, (a_raw if ret_raw_attn else attn)
