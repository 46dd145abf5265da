"""Fused on-device preprocessing: uint8 -> resize -> ImageNet normalize.

Replaces the reference's host-side cv2 decode + albumentations
Resize/Normalize/ToTensorV2 tail (train/dataset.py:179-187). Decode stays on
the host (JPEG entropy decode is not a TPU op); everything after the raw
uint8 tensor happens on device so HBM sees each pixel once. A Pallas-fused
variant lives in ops/pallas/preprocess.py; this XLA version is its golden
reference and already fuses into 2 kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize, nearest_resize

# train/dataset.py:183-185
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def preprocess_batch(
    images_u8: jax.Array,
    masks_u8: jax.Array | None,
    out_h: int,
    out_w: int,
    normalize: bool = True,
):
    """(B, H, W, 3) uint8 [+ (B, H, W) mask] -> resized float32, ImageNet
    normalized image in NHWC + int32 {0,1} mask (binarize >127,
    train/dataset.py:76)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = bilinear_resize(x, out_h, out_w)
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x - mean) / std
    if masks_u8 is None:
        return x
    m = (masks_u8 > 127).astype(jnp.float32)[..., None]
    m = nearest_resize(m, out_h, out_w)[..., 0].astype(jnp.int32)
    return x, m


def normalize_only(images01: jax.Array) -> jax.Array:
    """[0,1] float -> ImageNet-normalized (for the synthetic/augment path
    which is already float at target size)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (images01 - mean) / std
