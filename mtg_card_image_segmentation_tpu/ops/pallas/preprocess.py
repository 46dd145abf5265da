"""Fused uint8 -> float normalize Pallas kernel (the on-device half of the
preprocessing path, replacing albumentations Normalize/ToTensorV2,
train/dataset.py:179-187).

Layout trick: an NHWC uint8 image batch is viewed as a 2-D array
(B*H, W*C). Per-channel ImageNet constants become a length-W*C pattern
vector (the 3-channel pattern tiled W times), so the kernel is a pure
row-tiled VPU op:  out = in * scale_vec + shift_vec  with
scale = 1/(255*std), shift = -mean/std. One HBM read of the uint8 input,
one write of the bf16/f32 output — no intermediate fp32 image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtg_card_image_segmentation_tpu.data.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)

_ROW_TILE = 256


def _kernel(in_ref, scale_ref, shift_ref, out_ref):
    # Mosaic has no direct uint8 -> f32 cast; go through int32
    x = in_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = (x * scale_ref[:] + shift_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_normalize(
    images_u8: jax.Array,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, W, 3) uint8 -> ImageNet-normalized (B, H, W, 3) ``out_dtype``.

    Equivalent to ``(x/255 - mean) / std`` (data/preprocess.py), one fused
    pass.
    """
    b, h, w, c = images_u8.shape
    rows = b * h
    cols = w * c
    x2d = images_u8.reshape(rows, cols)

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    scale_pat = jnp.tile(1.0 / (255.0 * std), w).reshape(1, cols)
    shift_pat = jnp.tile(-mean / std, w).reshape(1, cols)

    grid = (pl.cdiv(rows, _ROW_TILE),)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, scale_pat, shift_pat)
    return out.reshape(b, h, w, c)
