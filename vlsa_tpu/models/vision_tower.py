"""Vision towers: OpenAI-CLIP ViT / ModifiedResNet and the CONCH (CoCa)
visual model.

Completes the SURVEY.md §2.2 "vendored CLIP / CONCH" rows beyond the text
path: the survival pipelines never run these (the reference grafts the MIL
encoder over `vl_model.visual` at load, ref model/utils_vl.py:140-147), but
the framework also serves as a standalone CONCH/CLIP inference stack — e.g.
extracting patch features on TPU instead of consuming precomputed ones.

Behavioural ports (torch-layout params so released checkpoints import
directly):
  * `CLIPViT`            — ref model/clip/model.py:206-240 VisionTransformer
  * `CLIPModifiedResNet` — ref model/clip/model.py:10-155 (3-conv stem,
    anti-aliased strides, attention pooling head)
  * `AttentionalPooler`  — ref model/conch/transformer.py:161-189 (torch
    MultiheadAttention with kdim/vdim = context_dim)
  * `ConchVisualModel`   — ref model/conch/vision_tower.py:13-152 (timm
    ViT trunk + contrast/caption attentional pools)

All matmul-heavy ops run with optional bf16 compute (f32 accumulation),
batched over images — MXU-friendly static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .text_encoder import ResidualAttentionBlock, _gelu

Array = jax.Array


# ---------------------------------------------------------------------------
# OpenAI CLIP ViT (ref model/clip/model.py:206-240)
# ---------------------------------------------------------------------------


class CLIPViT(nn.Module):
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """images [B, 3, H, W] (torch channel order) -> [B, output_dim]."""
        B = images.shape[0]
        D, P = self.width, self.patch_size
        scale = D ** -0.5
        conv1 = self.param("conv1_weight", nn.initializers.normal(scale),
                           (D, 3, P, P))  # torch OIHW, bias=False
        x = jax.lax.conv_general_dilated(
            images.astype(jnp.float32), conv1.astype(jnp.float32),
            window_strides=(P, P), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))  # [B, D, g, g]
        x = x.reshape(B, D, -1).transpose(0, 2, 1)       # [B, g*g, D]
        cls = self.param("class_embedding", nn.initializers.normal(scale), (D,))
        pos = self.param("positional_embedding", nn.initializers.normal(scale),
                         ((self.input_resolution // P) ** 2 + 1, D))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                D, self.heads, quick_gelu=True,
                compute_dtype=self.compute_dtype, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(scale),
                          (D, self.output_dim))
        return x @ proj


def import_clip_vit_state(state: dict, layers: int,
                          prefix: str = "visual.",
                          image_size: Optional[int] = None,
                          patch_size: Optional[int] = None) -> dict:
    """torch CLIP visual state dict -> CLIPViT params.

    When `image_size`/`patch_size` are given and the checkpoint's grid
    differs (e.g. the released 224-trained OpenAI weights loaded into a
    448-input extractor), the positional embedding is interpolated with
    the same timm-semantics `resize_pos_embed` the CONCH importer uses."""
    g = lambda k: np.asarray(state[prefix + k])
    pos = g("positional_embedding")            # [1 + g*g, D]
    if image_size is not None and patch_size is not None:
        new_g = image_size // patch_size
        if pos.shape[0] != new_g * new_g + 1:
            pos = resize_pos_embed(pos[None], (new_g, new_g),
                                   num_prefix_tokens=1)[0]
    params = {
        "conv1_weight": g("conv1.weight"),
        "class_embedding": g("class_embedding"),
        "positional_embedding": pos,
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
        "proj": g("proj"),
    }
    for i in range(layers):
        rb = f"transformer.resblocks.{i}."
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": g(rb + "ln_1.weight"), "bias": g(rb + "ln_1.bias")},
            "ln_2": {"scale": g(rb + "ln_2.weight"), "bias": g(rb + "ln_2.bias")},
            "attn": {
                "in_proj_weight": g(rb + "attn.in_proj_weight"),
                "in_proj_bias": g(rb + "attn.in_proj_bias"),
                "out_proj_weight": g(rb + "attn.out_proj.weight"),
                "out_proj_bias": g(rb + "attn.out_proj.bias"),
            },
            "c_fc_weight": g(rb + "mlp.c_fc.weight"),
            "c_fc_bias": g(rb + "mlp.c_fc.bias"),
            "c_proj_weight": g(rb + "mlp.c_proj.weight"),
            "c_proj_bias": g(rb + "mlp.c_proj.bias"),
        }
    return params


# ---------------------------------------------------------------------------
# OpenAI CLIP ModifiedResNet (ref model/clip/model.py:10-155)
# ---------------------------------------------------------------------------


class _BN(nn.Module):
    """Inference BatchNorm with torch-imported running stats as params
    (the tower is frozen in every use; training-mode stats not needed)."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:  # x [B, C, H, W]
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        shape = (1, self.features, 1, 1)
        inv = jax.lax.rsqrt(var.reshape(shape) + 1e-5)
        return (x - mean.reshape(shape)) * inv * scale.reshape(shape) \
            + bias.reshape(shape)


def _conv_nchw(x, w, stride=1, padding=0):
    pad = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _avg_pool_nchw(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID") / (k * k)


class Bottleneck(nn.Module):
    """ref model/clip/model.py:10-55: stride-1 convs with an avgpool after
    conv2 when stride > 1; avgpool-prepended downsample branch."""
    inplanes: int
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w1 = self.param("conv1_weight", nn.initializers.lecun_normal(),
                        (self.planes, self.inplanes, 1, 1))
        w2 = self.param("conv2_weight", nn.initializers.lecun_normal(),
                        (self.planes, self.planes, 3, 3))
        w3 = self.param("conv3_weight", nn.initializers.lecun_normal(),
                        (self.planes * self.expansion, self.planes, 1, 1))
        out = nn.relu(_BN(self.planes, name="bn1")(_conv_nchw(x, w1)))
        out = nn.relu(_BN(self.planes, name="bn2")(_conv_nchw(out, w2, padding=1)))
        if self.stride > 1:
            out = _avg_pool_nchw(out, self.stride)
        out = _BN(self.planes * self.expansion, name="bn3")(_conv_nchw(out, w3))
        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.expansion:
            dsw = self.param("downsample_conv_weight", nn.initializers.lecun_normal(),
                             (self.planes * self.expansion, self.inplanes, 1, 1))
            identity = x if self.stride == 1 else _avg_pool_nchw(x, self.stride)
            identity = _BN(self.planes * self.expansion, name="downsample_bn")(
                _conv_nchw(identity, dsw))
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """ref model/clip/model.py:58-91: mean-token query attention pooling."""
    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:  # x [B, C, H, W]
        B, C, H, W = x.shape
        out_dim = self.output_dim or self.embed_dim
        x = x.reshape(B, C, H * W).transpose(0, 2, 1)     # [B, HW, C]
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (self.spacial_dim ** 2 + 1, self.embed_dim))
        x = x + pos
        qw = self.param("q_proj_weight", nn.initializers.lecun_normal(), (C, C))
        qb = self.param("q_proj_bias", nn.initializers.zeros, (C,))
        kw = self.param("k_proj_weight", nn.initializers.lecun_normal(), (C, C))
        kb = self.param("k_proj_bias", nn.initializers.zeros, (C,))
        vw = self.param("v_proj_weight", nn.initializers.lecun_normal(), (C, C))
        vb = self.param("v_proj_bias", nn.initializers.zeros, (C,))
        cw = self.param("c_proj_weight", nn.initializers.lecun_normal(), (out_dim, C))
        cb = self.param("c_proj_bias", nn.initializers.zeros, (out_dim,))
        H_ = self.num_heads
        hd = C // H_
        q = (x[:, :1] @ qw.T + qb).reshape(B, 1, H_, hd).transpose(0, 2, 1, 3)
        k = (x @ kw.T + kb).reshape(B, -1, H_, hd).transpose(0, 2, 1, 3)
        v = (x @ vw.T + vb).reshape(B, -1, H_, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, C)
        return ctx @ cw.T + cb


class CLIPModifiedResNet(nn.Module):
    """ref model/clip/model.py:94-155."""
    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 512
    heads: int = 32
    input_resolution: int = 224
    width: int = 64

    @nn.compact
    def __call__(self, images: Array) -> Array:
        w = self.width
        x = images.astype(jnp.float32)
        c1 = self.param("conv1_weight", nn.initializers.lecun_normal(), (w // 2, 3, 3, 3))
        c2 = self.param("conv2_weight", nn.initializers.lecun_normal(), (w // 2, w // 2, 3, 3))
        c3 = self.param("conv3_weight", nn.initializers.lecun_normal(), (w, w // 2, 3, 3))
        x = nn.relu(_BN(w // 2, name="bn1")(_conv_nchw(x, c1, stride=2, padding=1)))
        x = nn.relu(_BN(w // 2, name="bn2")(_conv_nchw(x, c2, padding=1)))
        x = nn.relu(_BN(w, name="bn3")(_conv_nchw(x, c3, padding=1)))
        x = _avg_pool_nchw(x, 2)
        inplanes = w
        for li, (planes_mult, blocks) in enumerate(zip((1, 2, 4, 8), self.layers)):
            planes = w * planes_mult
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                x = Bottleneck(inplanes, planes, stride if b == 0 else 1,
                               name=f"layer{li + 1}_{b}")(x)
                inplanes = planes * 4
        return AttentionPool2d(self.input_resolution // 32, w * 32, self.heads,
                               self.output_dim, name="attnpool")(x)


def import_clip_resnet_state(state: dict, layers: Sequence[int],
                             prefix: str = "visual.") -> dict:
    g = lambda k: np.asarray(state[prefix + k])

    def bn(name):
        return {"weight": g(name + ".weight"), "bias": g(name + ".bias"),
                "running_mean": g(name + ".running_mean"),
                "running_var": g(name + ".running_var")}

    params = {
        "conv1_weight": g("conv1.weight"), "bn1": bn("bn1"),
        "conv2_weight": g("conv2.weight"), "bn2": bn("bn2"),
        "conv3_weight": g("conv3.weight"), "bn3": bn("bn3"),
        "attnpool": {
            "positional_embedding": g("attnpool.positional_embedding"),
            "q_proj_weight": g("attnpool.q_proj.weight"),
            "q_proj_bias": g("attnpool.q_proj.bias"),
            "k_proj_weight": g("attnpool.k_proj.weight"),
            "k_proj_bias": g("attnpool.k_proj.bias"),
            "v_proj_weight": g("attnpool.v_proj.weight"),
            "v_proj_bias": g("attnpool.v_proj.bias"),
            "c_proj_weight": g("attnpool.c_proj.weight"),
            "c_proj_bias": g("attnpool.c_proj.bias"),
        },
    }
    for li, blocks in enumerate(layers):
        for b in range(blocks):
            rb = f"layer{li + 1}.{b}."
            blk = {
                "conv1_weight": g(rb + "conv1.weight"), "bn1": bn(rb + "bn1"),
                "conv2_weight": g(rb + "conv2.weight"), "bn2": bn(rb + "bn2"),
                "conv3_weight": g(rb + "conv3.weight"), "bn3": bn(rb + "bn3"),
            }
            if (prefix + rb + "downsample.0.weight") in state:
                blk["downsample_conv_weight"] = g(rb + "downsample.0.weight")
                blk["downsample_bn"] = bn(rb + "downsample.1")
            params[f"layer{li + 1}_{b}"] = blk
    return params


# ---------------------------------------------------------------------------
# CONCH (CoCa) visual model (ref model/conch/vision_tower.py:13-152)
# ---------------------------------------------------------------------------


def _use_flash_attention(L: int) -> bool:
    """The ViT trunk's self-attention materialises [B, H, L, L] logits in
    HBM (~1.9 GB per layer at B=64, L=785) — the dominant traffic of the
    extraction forward.  On TPU, route through JAX's fused Pallas flash
    kernel whenever the sequence is long enough to matter."""
    from ..ops.flags import pallas_disabled
    return (jax.default_backend() == "tpu" and L >= 256
            and not pallas_disabled())


def _flash_self_attention(q: Array, k: Array, v: Array) -> Array:
    """Non-causal fused self-attention, [B, H, L, hd] in/out.

    L is padded to a 128 multiple for the kernel's block grid; padded
    tokens get segment id 0 (valid tokens 1), so they only attend each
    other and the valid rows are exact — the pad rows are sliced off.

    Block sizes: the kernel's 128-everywhere default launches a huge grid
    of tiny tiles and loses to dense XLA attention at ViT lengths (22.7 ms
    vs 9.2 ms at B=64, H=12, Lp=896 on v5e).  Whole-sequence tiles with a
    few batch entries per invocation win: 896/896/896 b4 = 5.4 ms (1.7x
    over dense).  We size block_b so the in-kernel f32 logits + operands
    stay under ~12 MB of the 16 MB VMEM."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    B, H, L, hd = q.shape
    Lp = ((L + 127) // 128) * 128
    if Lp != L:
        pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    seg = jnp.broadcast_to(
        (jnp.arange(Lp) < L).astype(jnp.int32)[None], (B, Lp))
    per_b = Lp * Lp * 4 + 3 * Lp * hd * 2
    if per_b > int(12e6):
        # long-sequence regime (not hit by the ViT trunks): chunk q instead
        bq = 512 if Lp % 512 == 0 else 128
        bb, block_q = 1, bq
    else:
        bb, block_q = max(1, min(4, int(12e6) // per_b)), Lp
        while B % bb:
            bb -= 1
    bs = BlockSizes(block_q=block_q, block_k_major=Lp, block_k=Lp, block_b=bb,
                    block_q_major_dkv=block_q, block_k_major_dkv=Lp,
                    block_k_dkv=Lp, block_q_dkv=block_q,
                    block_k_major_dq=Lp, block_k_dq=Lp, block_q_dq=block_q)
    ctx = flash_attention(q, k, v, segment_ids=SegmentIds(seg, seg),
                          sm_scale=1.0 / float(np.sqrt(hd)), block_sizes=bs)
    return ctx[:, :, :L]


def _int8_dynamic_linear(h: Array, w_q: Array, w_s: Array) -> Array:
    """w8a8 linear: per-token dynamic symmetric int8 activations against
    per-output-channel static int8 weights (`precision.quantize_rows`).

    y = (q(h) @ w_q^T) * s_h * s_w, with the s8 x s8 dot accumulating in
    int32 — native MXU int8 mode on TPU (2x the bf16 MACs/cycle).  The
    activation scale is fit per token (`max|h| / 127`), so h/s is in
    [-127, 127] by construction and no clip is needed.  Bias is added by
    the caller in f32, like the float path."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s_h = jnp.maximum(amax, 1e-30) / 127.0
    h_q = jnp.round(h / s_h).astype(jnp.int8)
    acc = jax.lax.dot_general(h_q, w_q, (((h_q.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s_h * w_s[None, None, :])


class TimmViTBlock(nn.Module):
    """timm vision_transformer.Block (pre-LN, fused qkv Linear, GELU MLP).

    `residual_dtype` sets the dtype the residual stream is carried in
    between ops.  float32 (default) reproduces the reference bit-for-bit
    up to matmul rounding; bfloat16 halves the activation HBM traffic of
    the frozen extraction forward (LayerNorm statistics still run in f32
    via flax's promotion, matmuls still accumulate f32 — only the
    carried stream and the residual adds round to bf16).

    `quantized` switches the four linears (qkv/proj/fc1/fc2 — ~85% of the
    trunk FLOPs) to the w8a8 path: int8 weights + per-channel scales in
    the param tree (`precision.quantize_vision_tower_weights` layout),
    per-token dynamic activation quantization in-graph.  Attention itself
    (flash kernel), LayerNorms, GELU, biases and the residual stream keep
    the float path.  Inference-only: a frozen-tower semantics change that
    needs accuracy validation against real weights before production use."""
    width: int
    heads: int
    mlp_ratio: float = 4.0
    compute_dtype: str = "float32"
    residual_dtype: str = "float32"
    quantized: bool = False

    def _linear_params(self, name: str, out_dim: int, in_dim: int):
        if self.quantized:
            w = self.param(name + "_weight", nn.initializers.zeros,
                           (out_dim, in_dim), jnp.int8)
            s = self.param(name + "_weight_scale", nn.initializers.ones,
                           (out_dim,))
            return w, s
        return self.param(name + "_weight", nn.initializers.lecun_normal(),
                          (out_dim, in_dim)), None

    def _linear(self, h, w, s, cdt):
        if self.quantized:
            return _int8_dynamic_linear(h.astype(jnp.float32), w, s)
        return jnp.dot(h.astype(cdt), w.T.astype(cdt),
                       preferred_element_type=jnp.float32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        D, H = self.width, self.heads
        hd = D // H
        B, L, _ = x.shape
        cdt = jnp.dtype(self.compute_dtype)
        rdt = jnp.dtype(self.residual_dtype)
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv_w, qkv_s = self._linear_params("qkv", 3 * D, D)
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * D,))
        proj_w, proj_s = self._linear_params("proj", D, D)
        proj_b = self.param("proj_bias", nn.initializers.zeros, (D,))
        qkv = self._linear(h, qkv_w, qkv_s, cdt) + qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = lambda t: t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        q, k, v = shp(q), shp(k), shp(v)
        if _use_flash_attention(L):
            ctx = _flash_self_attention(q.astype(cdt), k.astype(cdt),
                                        v.astype(cdt)).astype(jnp.float32)
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt), k.astype(cdt),
                           preferred_element_type=jnp.float32) / np.sqrt(hd), -1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(cdt), v.astype(cdt),
                             preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + (self._linear(ctx, proj_w, proj_s, cdt) + proj_b).astype(rdt)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        hid_dim = int(D * self.mlp_ratio)
        mlp_w1, mlp_s1 = self._linear_params("fc1", hid_dim, D)
        mlp_b1 = self.param("fc1_bias", nn.initializers.zeros, (hid_dim,))
        mlp_w2, mlp_s2 = self._linear_params("fc2", D, hid_dim)
        mlp_b2 = self.param("fc2_bias", nn.initializers.zeros, (D,))
        hid = _gelu(self._linear(h, mlp_w1, mlp_s1, cdt) + mlp_b1)
        return x + (self._linear(hid, mlp_w2, mlp_s2, cdt)
                    + mlp_b2).astype(rdt)


class TimmViTTrunk(nn.Module):
    """timm 'vit_base' trunk as used by the CONCH factory
    (ref model/conch/coca_model.py:76-86: forward = forward_features,
    returns ALL tokens incl. cls)."""
    image_size: int = 448
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    compute_dtype: str = "float32"
    residual_dtype: str = "float32"
    quantized: bool = False

    @nn.compact
    def __call__(self, images: Array) -> Array:
        B = images.shape[0]
        D, P = self.width, self.patch_size
        w = self.param("patch_embed_weight", nn.initializers.lecun_normal(),
                       (D, 3, P, P))
        b = self.param("patch_embed_bias", nn.initializers.zeros, (D,))
        # Non-overlapping stride-P conv == per-patch matmul: run it in the
        # compute dtype (bf16 operands, f32 accumulation) so it lands on the
        # MXU at full rate instead of the 4x-slower f32 path.
        cdt = jnp.dtype(self.compute_dtype)
        x = jax.lax.conv_general_dilated(
            images.astype(cdt), w.astype(cdt),
            window_strides=(P, P), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        x = x.reshape(B, D, -1).transpose(0, 2, 1) + b
        n_tok = (self.image_size // P) ** 2
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tok + 1, D))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        x = (x + pos).astype(jnp.dtype(self.residual_dtype))
        for i in range(self.layers):
            x = TimmViTBlock(D, self.heads, compute_dtype=self.compute_dtype,
                             residual_dtype=self.residual_dtype,
                             quantized=self.quantized,
                             name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)  # [B, 1+N, D]


class AttentionalPooler(nn.Module):
    """ref model/conch/transformer.py:161-189: learned queries cross-attend
    the (ln'd) context; torch MultiheadAttention with kdim=vdim=context."""
    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256

    @nn.compact
    def __call__(self, x: Array, key_mask: Optional[Array] = None) -> Array:
        B = x.shape[0]
        Dm, Dc, H, Q = self.d_model, self.context_dim, self.n_head, self.n_queries
        hd = Dm // H
        query = self.param("query", nn.initializers.normal(1.0), (Q, Dm))
        x = nn.LayerNorm(epsilon=1e-5, name="ln_k")(x)
        q_in = nn.LayerNorm(epsilon=1e-5, name="ln_q")(query)
        # torch MHA with kdim/vdim: separate q/k/v projection weights
        qw = self.param("q_proj_weight", nn.initializers.lecun_normal(), (Dm, Dm))
        kw = self.param("k_proj_weight", nn.initializers.lecun_normal(), (Dm, Dc))
        vw = self.param("v_proj_weight", nn.initializers.lecun_normal(), (Dm, Dc))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * Dm,))
        ow = self.param("out_proj_weight", nn.initializers.lecun_normal(), (Dm, Dm))
        ob = self.param("out_proj_bias", nn.initializers.zeros, (Dm,))
        q = (q_in @ qw.T + in_b[:Dm]).reshape(Q, H, hd).transpose(1, 0, 2)  # [H,Q,hd]
        k = (x @ kw.T + in_b[Dm:2 * Dm]).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        v = (x @ vw.T + in_b[2 * Dm:]).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("hqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if key_mask is not None:  # True = valid key
            logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Q, Dm)
        return ctx @ ow.T + ob


class ConchVisualModel(nn.Module):
    """ref model/conch/vision_tower.py:13-152 with the conch_ViT-B-16 config
    (attentional contrast pool, 1 query; caption pool, 256 queries)."""
    embed_dim_contrast: int = 512
    embed_dim_caption: int = 768
    image_size: int = 448
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    attn_pooler_heads: int = 8
    n_queries_contrast: int = 1
    n_queries_caption: int = 256
    output_tokens: bool = True
    compute_dtype: str = "float32"
    trunk_residual_dtype: str = "float32"
    trunk_quantized: bool = False

    def setup(self):
        self.trunk = TimmViTTrunk(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.width, layers=self.layers, heads=self.heads,
            compute_dtype=self.compute_dtype,
            residual_dtype=self.trunk_residual_dtype,
            quantized=self.trunk_quantized)
        self.attn_pool_contrast = AttentionalPooler(
            self.embed_dim_contrast, self.width, self.attn_pooler_heads,
            self.n_queries_contrast)
        self.ln_contrast = nn.LayerNorm(epsilon=1e-5)
        self.proj_contrast = self.param(
            "proj_contrast", nn.initializers.normal(self.width ** -0.5),
            (self.embed_dim_contrast, self.embed_dim_contrast))
        self.attn_pool_caption = AttentionalPooler(
            self.embed_dim_caption, self.width, self.attn_pooler_heads,
            self.n_queries_caption)
        self.ln_caption = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, images: Array):
        tokens = self.trunk(images)                              # [B, 1+N, W]
        pooled = self.attn_pool_contrast(tokens)[:, 0]           # single query
        pooled = self.ln_contrast(pooled) @ self.proj_contrast
        cap = self.ln_caption(self.attn_pool_caption(tokens))    # [B, 256, Wc]
        if self.output_tokens:
            return pooled, cap
        return pooled

    def forward_no_head(self, images: Array, normalize: bool = False):
        tokens = self.trunk(images)
        pooled = self.ln_contrast(self.attn_pool_contrast(tokens)[:, 0])
        if normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled


def import_attentional_pooler_state(state: dict, prefix: str) -> dict:
    g = lambda k: np.asarray(state[prefix + k])
    out = {
        "query": g("query"),
        "ln_q": {"scale": g("ln_q.weight"), "bias": g("ln_q.bias")},
        "ln_k": {"scale": g("ln_k.weight"), "bias": g("ln_k.bias")},
        "in_proj_bias": g("attn.in_proj_bias"),
        "out_proj_weight": g("attn.out_proj.weight"),
        "out_proj_bias": g("attn.out_proj.bias"),
    }
    if (prefix + "attn.in_proj_weight") in state:
        # kdim == embed_dim: torch MHA fuses the three projections
        W = g("attn.in_proj_weight")
        D = W.shape[0] // 3
        out["q_proj_weight"] = W[:D]
        out["k_proj_weight"] = W[D:2 * D]
        out["v_proj_weight"] = W[2 * D:]
    else:
        out["q_proj_weight"] = g("attn.q_proj_weight")
        out["k_proj_weight"] = g("attn.k_proj_weight")
        out["v_proj_weight"] = g("attn.v_proj_weight")
    return out


def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out, in] bilinear interpolation matrix with torch
    F.interpolate(..., mode='bilinear', align_corners=False, antialias=False)
    semantics: src = (dst + 0.5) * in/out - 0.5, negative clamped to 0."""
    c = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    c = np.maximum(c, 0.0)
    i0 = np.floor(c).astype(np.int64)
    frac = c - i0
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    M = np.zeros((out_size, in_size), np.float64)
    np.add.at(M, (np.arange(out_size), i0), 1.0 - frac)
    np.add.at(M, (np.arange(out_size), i1), frac)
    return M


def resize_pos_embed(pos_embed: np.ndarray, new_grid: "tuple[int, int]",
                     num_prefix_tokens: int = 1) -> np.ndarray:
    """timm `resample_abs_pos_embed` behaviour (bilinear, antialias=False,
    align_corners=False) as the reference wires it for checkpoint loading
    (ref model/conch/coca_model.py:348-370, factory.py:27-31): released
    224-trained CONCH weights load into a 448-input model by interpolating
    the [1, 1+g*g, C] absolute position table on its spatial grid.

    Pure numpy; parity vs torch F.interpolate asserted in
    tests/test_extract.py."""
    pos_embed = np.asarray(pos_embed, np.float32)
    assert pos_embed.ndim == 3 and pos_embed.shape[0] == 1
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[0, num_prefix_tokens:]
    g_old = int(round(np.sqrt(grid.shape[0])))
    assert g_old * g_old == grid.shape[0], "non-square pos-embed grid"
    gh, gw = new_grid
    if (g_old, g_old) == (gh, gw):
        return pos_embed
    x = grid.reshape(g_old, g_old, -1).astype(np.float64)  # [H, W, C]
    Mh = _bilinear_matrix(g_old, gh)
    Mw = _bilinear_matrix(g_old, gw)
    x = np.einsum("oh,hwc->owc", Mh, x)
    x = np.einsum("ow,hwc->hoc", Mw, x)
    out = x.reshape(1, gh * gw, -1).astype(np.float32)
    return np.concatenate([prefix, out], axis=1)


def import_conch_visual_state(state: dict, layers: int = 12,
                              prefix: str = "visual.",
                              image_size: int = 448,
                              patch_size: int = 16) -> dict:
    """CONCH pytorch_model.bin visual.* -> ConchVisualModel params.

    Resizes the absolute pos-embed table to the target grid when the
    checkpoint was trained at a different resolution (the released CONCH
    weights are 224-trained; the reference runs them at 448 — ref
    model/conch/factory.py:27-31)."""
    g = lambda k: np.asarray(state[prefix + k])
    grid = image_size // patch_size
    trunk = {
        "patch_embed_weight": g("trunk.patch_embed.proj.weight"),
        "patch_embed_bias": g("trunk.patch_embed.proj.bias"),
        "cls_token": g("trunk.cls_token"),
        "pos_embed": resize_pos_embed(g("trunk.pos_embed"), (grid, grid)),
        "norm": {"scale": g("trunk.norm.weight"), "bias": g("trunk.norm.bias")},
    }
    for i in range(layers):
        rb = f"trunk.blocks.{i}."
        trunk[f"block_{i}"] = {
            "norm1": {"scale": g(rb + "norm1.weight"), "bias": g(rb + "norm1.bias")},
            "norm2": {"scale": g(rb + "norm2.weight"), "bias": g(rb + "norm2.bias")},
            "qkv_weight": g(rb + "attn.qkv.weight"),
            "qkv_bias": g(rb + "attn.qkv.bias"),
            "proj_weight": g(rb + "attn.proj.weight"),
            "proj_bias": g(rb + "attn.proj.bias"),
            "fc1_weight": g(rb + "mlp.fc1.weight"),
            "fc1_bias": g(rb + "mlp.fc1.bias"),
            "fc2_weight": g(rb + "mlp.fc2.weight"),
            "fc2_bias": g(rb + "mlp.fc2.bias"),
        }
    return {
        "trunk": trunk,
        "attn_pool_contrast": import_attentional_pooler_state(
            state, prefix + "attn_pool_contrast."),
        "ln_contrast": {"scale": g("ln_contrast.weight"),
                        "bias": g("ln_contrast.bias")},
        "proj_contrast": g("proj_contrast"),
        "attn_pool_caption": import_attentional_pooler_state(
            state, prefix + "attn_pool_caption."),
        "ln_caption": {"scale": g("ln_caption.weight"),
                       "bias": g("ln_caption.bias")},
    }
