"""Bilinear / nearest resize with exact half-pixel (align_corners=False)
semantics.

This op is the fidelity-critical piece of the LR-ASPP decoder: the reference
uses ``F.interpolate(mode='bilinear', align_corners=False)``
(train/model.py:140) and the exported ONNX ``Resize`` with
``coordinate_transformation_mode=half_pixel``. ``jax.image.resize`` applies
antialiasing on downscale and has different edge handling, so we implement the
gather-based formulation directly — it matches torch bitwise-close in fp32 and
is what the Pallas fused upsample+add kernel (ops/pallas/) is golden-tested
against.

Layout: NHWC (TPU-native). Separable: gather+lerp along H, then along W; XLA
fuses the whole thing into a couple of gathers and FMAs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _half_pixel_coords(in_size: int, out_size: int):
    """Source coordinates/weights for half-pixel linear interpolation.

    src = (dst + 0.5) * (in/out) - 0.5, clamped to [0, in-1] (torch clamps the
    negative side before computing the interpolation weight; the upper clamp is
    weight-equivalent because lo==hi there).
    """
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = jnp.clip((dst + 0.5) * scale - 0.5, 0.0, float(in_size - 1))
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


@functools.partial(jax.jit, static_argnums=(1, 2))
def bilinear_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize NHWC (or HWC) ``x`` to (out_h, out_w), half-pixel bilinear,
    no antialiasing — torch ``F.interpolate(..., mode='bilinear',
    align_corners=False)`` / ONNX ``Resize(half_pixel, linear)`` semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, in_h, in_w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    if in_h != out_h:
        lo, hi, w = _half_pixel_coords(in_h, out_h)
        top = jnp.take(xf, lo, axis=1)
        bot = jnp.take(xf, hi, axis=1)
        xf = top + (bot - top) * w[None, :, None, None]
    if in_w != out_w:
        lo, hi, w = _half_pixel_coords(in_w, out_w)
        left = jnp.take(xf, lo, axis=2)
        right = jnp.take(xf, hi, axis=2)
        xf = left + (right - left) * w[None, None, :, None]

    out = xf.astype(orig_dtype)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnums=(1, 2))
def nearest_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize, torch ``mode='nearest'`` semantics
    (src = floor(dst * in/out)) — used by the YOLO12 head upsample."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, in_h, in_w, c = x.shape
    idx_h = jnp.minimum(
        (jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)).astype(jnp.int32),
        in_h - 1,
    )
    idx_w = jnp.minimum(
        (jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)).astype(jnp.int32),
        in_w - 1,
    )
    out = jnp.take(jnp.take(x, idx_h, axis=1), idx_w, axis=2)
    return out[0] if squeeze else out


def upsample_add(high: jax.Array, low: jax.Array) -> jax.Array:
    """Bilinear-upsample ``high`` to ``low``'s spatial size and add — the
    LR-ASPP decoder merge (reference train/model.py:140-142). The Pallas
    fused variant lives in ops/pallas/decoder.py; this is the XLA reference."""
    _, h, w, _ = low.shape
    return bilinear_resize(high, h, w) + low
