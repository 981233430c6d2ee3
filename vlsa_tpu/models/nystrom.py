"""Nystrom self-attention in JAX (masked), used by TransMIL.

Re-implements the algorithm of the `nystrom_attention` package the reference
vendors via pip (ref model/deepmil.py:298-324): landmark means over segments,
three-matrix Nystrom factorisation with iterative Moore-Penrose pseudo-inverse,
and a depthwise-conv residual on the values.  Padding is handled with an
explicit key mask instead of the reference's front-padding trick.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchLinear

Array = jax.Array


def moore_penrose_pinv(x: Array, iters: int = 6) -> Array:
    """Iterative pseudo-inverse (same scheme as the reference package)."""
    abs_x = jnp.abs(x)
    col = jnp.max(jnp.sum(abs_x, axis=-1), axis=-1)
    row = jnp.max(jnp.sum(abs_x, axis=-2), axis=-1)
    z = jnp.swapaxes(x, -1, -2) / (col * row)[..., None, None]
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13 * eye - xz @ (15 * eye - xz @ (7 * eye - xz)))
    return z


class NystromAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 return_attn: bool = False, train: bool = False):
        B, N, _ = x.shape
        h, m = self.heads, self.num_landmarks
        inner = self.dim_head * h
        scale = self.dim_head ** -0.5

        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(B, N, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(to_heads, (q, k, v))  # [B, h, N, d]
        q = q * scale

        if mask is None:
            mask = jnp.ones((B, N), bool)
        mf = mask[:, None, :, None].astype(x.dtype)  # [B, 1, N, 1]

        # landmark means over ceil(N/m)-sized segments (masked)
        seg = -(-N // m)  # ceil
        pad = seg * m - N
        def seg_mean(t):
            tp = jnp.pad(t * mf, ((0, 0), (0, 0), (0, pad), (0, 0)))
            tp = tp.reshape(B, h, m, seg, self.dim_head)
            cnt = jnp.pad(mf, ((0, 0), (0, 0), (0, pad), (0, 0)))
            cnt = cnt.reshape(B, 1, m, seg, 1).sum(axis=3)
            return tp.sum(axis=3) / jnp.maximum(cnt, 1.0)

        q_l = seg_mean(q)  # [B, h, m, d]
        k_l = seg_mean(k)

        neg = -1e30
        key_mask = mask[:, None, None, :]  # [B, 1, 1, N]
        sim1 = jnp.einsum("bhnd,bhmd->bhnm", q, k_l)
        sim2 = jnp.einsum("bhmd,bhld->bhml", q_l, k_l)
        sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_l, k)
        sim3 = jnp.where(key_mask, sim3, neg)

        attn1 = jax.nn.softmax(sim1, axis=-1)
        attn2 = jax.nn.softmax(sim2, axis=-1)
        attn3 = jax.nn.softmax(sim3, axis=-1)
        attn2_inv = moore_penrose_pinv(attn2, self.pinv_iterations)

        out = attn1 @ attn2_inv @ (attn3 @ v)  # [B, h, N, d]

        if self.residual:
            # depthwise conv over the sequence axis per head (ref package residual)
            kernel = self.param(
                "res_conv_kernel",
                jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (self.residual_conv_kernel, 1, 1, h))
            # v: [B, h, N, d] -> NHWC [B, N, d, h]
            v_img = v.transpose(0, 2, 3, 1)
            res = jax.lax.conv_general_dilated(
                v_img, kernel, window_strides=(1, 1),
                padding=[(self.residual_conv_kernel // 2,) * 2, (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=h)
            out = out + res.transpose(0, 3, 1, 2)

        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = TorchLinear(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if return_attn:
            attn = attn1 @ attn2_inv @ attn3  # [B, h, N, N]
            return out, attn
        return out
