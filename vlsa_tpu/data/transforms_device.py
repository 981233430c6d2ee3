"""Device-side (TPU) image preprocessing for feature extraction.

The host transform stack (`transforms.py`) reproduces the reference's
torchvision/PIL preprocessing bit-exactly in numpy — but on a weak host
CPU the fixed-point bicubic resize becomes the end-to-end extraction
bottleneck while the chip idles (measured 0.7 tiles/s host vs ~390
tiles/s for the fused tower forward, EXTRACT_CHIP.json).  PIL's separable
resize touches only `ksize` (~6) input pixels per output pixel, so the
whole stack moves onto the device as per-tap gathers + int32 elementwise
multiply-adds:

  u8 [B, H, W, 3]  --ksize gathers + int32 MAC (horizontal, clip8)-->
                   --ksize gathers + int32 MAC (vertical,   clip8)-->
                   --static center-crop slice-->
                   --(x/255 - mean)/std, HWC->CHW-->  f32 [B, 3, S, S]

The integer pipeline (resize + crop) is BYTE-EXACT vs the host path:
PIL's 8bpc pipeline accumulates in int32 (|acc| <= 255 * 2^22 * ~1.2 <
2^31) with an arithmetic-shift round and a uint8 intermediate between the
passes.  Elementwise int32 ops are exact on every XLA backend; a dense
int32 matmul is NOT — TPU lowers integer dots through float passes that
lose exactness above 2^24, which an on-chip A/B caught (byte_exact false
for the einsum form; scripts/validate_extraction_chip.py asserts the tap
form).  The final f32 normalize matches numpy to <= 1 ulp (~5e-7: TPU
rounds f32 division differently) — noise far below the tower's bf16
compute error.

Two further wins beyond offloading host work:
  * host->device traffic drops 4x (u8 tiles instead of f32 tensors),
  * preprocessing fuses into the same jitted program as the vision-tower
    forward, so tile decode (host) overlaps resize+encode (device).

Reference semantics: ref model/conch/transform.py:11-39 (Resize(448,
BICUBIC) -> CenterCrop(448) -> ToTensor -> Normalize) and
ref model/clip/clip.py:79-86.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from .transforms import (_PRECISION_BITS, _resample_taps_u8,
                         OPENAI_DATASET_MEAN, OPENAI_DATASET_STD)


def _resize_plan(in_hw: Tuple[int, int], size: int):
    """torchvision Resize(int) shortest-edge target for an [H, W] input."""
    h, w = in_hw
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return h, w
    new_short, new_long = size, int(size * long / short)
    return ((new_long, new_short) if w <= h else (new_short, new_long))


def _tap_resize(jnp, y, axis: int, in_size: int, xmin_np, coeffs_np):
    """One separable resize pass along `axis` of a uint8 array, PIL-exact:
    per-tap gather + int32 multiply-accumulate + clip8.  `y` stays uint8
    between passes (PIL's intermediate), gathers read u8 (4x less traffic
    than an int32 operand) and the MAC runs in exact int32."""
    ksize = coeffs_np.shape[1]
    half = 1 << (_PRECISION_BITS - 1)
    # coeff broadcast shape: [out] along `axis`, 1 elsewhere (rank 4 input)
    cshape = [1, 1, 1, 1]
    cshape[axis] = coeffs_np.shape[0]
    acc = jnp.full((), half, jnp.int32)
    for k in range(ksize):
        idx = np.minimum(xmin_np + k, in_size - 1)  # pad taps have coeff 0
        ck = coeffs_np[:, k].astype(np.int32)
        if not np.any(ck):
            continue
        tap = jnp.take(y, jnp.asarray(idx.astype(np.int32)), axis=axis)
        acc = acc + tap.astype(jnp.int32) * jnp.asarray(ck).reshape(cshape)
    return jnp.clip(jnp.right_shift(acc, _PRECISION_BITS),
                    0, 255).astype(jnp.uint8)


def build_device_preprocess(in_hw: Tuple[int, int], image_size: int,
                            mean: Sequence[float] = OPENAI_DATASET_MEAN,
                            std: Sequence[float] = OPENAI_DATASET_STD,
                            normalize: bool = True):
    """Build a jittable `fn(u8 [B, H, W, 3]) -> f32 [B, 3, S, S]` for one
    input shape (the tiler's fixed patch size).

    Exactness contract vs `transforms.preprocess_tile` (asserted on the
    real chip by scripts/validate_extraction_chip.py): the integer
    pipeline — fixed-point resize + crop — is byte-exact on every backend;
    the final f32 normalize matches numpy to <= 1 ulp (~5e-7; TPU's f32
    divide rounds differently than the host), noise far below the tower's
    own bf16 compute error.  `normalize=False` returns the cropped uint8
    [B, S, S, 3] instead (the byte-exact stage, used by the validators).

    The fixed-point tap tables are baked in as int32 constants; the
    center-crop offsets are static (shortest-edge resize guarantees both
    edges >= image_size, so the pad branch of the host path cannot
    trigger)."""
    import jax.numpy as jnp

    new_h, new_w = _resize_plan(in_hw, image_size)
    h, w = in_hw
    taps_w = _resample_taps_u8(w, new_w) if new_w != w else None
    taps_h = _resample_taps_u8(h, new_h) if new_h != h else None
    top = int(round((new_h - image_size) / 2.0))
    left = int(round((new_w - image_size) / 2.0))
    mean_c = jnp.asarray(mean, jnp.float32)
    std_c = jnp.asarray(std, jnp.float32)

    def fn(x):
        assert x.dtype == jnp.uint8 and x.shape[1:] == (h, w, 3), \
            f"expected u8 [B, {h}, {w}, 3], got {x.dtype} {x.shape}"
        y = x
        if taps_w is not None:  # horizontal pass, u8 intermediate (PIL order)
            y = _tap_resize(jnp, y, 2, w, *taps_w)
        if taps_h is not None:  # vertical pass
            y = _tap_resize(jnp, y, 1, h, *taps_h)
        y = y[:, top:top + image_size, left:left + image_size, :]
        if not normalize:
            return y
        xf = (y.astype(jnp.float32) / 255.0 - mean_c) / std_c
        return xf.transpose(0, 3, 1, 2)

    return fn
