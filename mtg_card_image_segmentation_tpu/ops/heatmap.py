"""Keypoint heatmap ops: Gaussian target rendering + argmax / soft-argmax
decoding + thresholded peak extraction.

Behavioral spec: train-pose-estimation_custom/model.py:133-192 (argmax decode
normalized by (size-1); Gaussian targets exp(-d^2 / 2 sigma^2)) and
inference_test.py:221-255 (peak extraction with confidence threshold).
Layout is NHWK (heatmaps channel-last, K = num keypoints) — TPU-native.

soft-argmax is an addition over the reference: differentiable sub-pixel
decoding (softmax-weighted expectation), which is both more accurate than
integer argmax and trivially fused by XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def gaussian_heatmaps(
    centers_xy: jax.Array, height: int, width: int, sigma: float = 2.0
) -> jax.Array:
    """Render (K, 2) xy centers (heatmap-pixel coords) -> (H, W, K) targets.
    Centers with any negative coordinate (missing keypoint) render as zeros."""
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    cx = centers_xy[:, 0][None, None, :]
    cy = centers_xy[:, 1][None, None, :]
    d2 = (x[..., None] - cx) ** 2 + (y[..., None] - cy) ** 2
    hm = jnp.exp(-d2 / (2.0 * sigma**2))
    valid = jnp.all(centers_xy >= 0, axis=-1)[None, None, :]
    return jnp.where(valid, hm, 0.0)


def gaussian_heatmaps_batch(
    centers_xy: jax.Array, height: int, width: int, sigma: float = 2.0
) -> jax.Array:
    """(B, K, 2) -> (B, H, W, K)."""
    return jax.vmap(lambda c: gaussian_heatmaps(c, height, width, sigma))(centers_xy)


def decode_argmax(heatmaps: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, H, W, K) -> ((B, K, 2) xy normalized to [0,1] by (size-1),
    (B, K) peak values). Reference decode (model.py:133-164)."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (B, K)
    vals = jnp.max(flat, axis=1)
    yy = (idx // w).astype(jnp.float32) / (h - 1)
    xx = (idx % w).astype(jnp.float32) / (w - 1)
    return jnp.stack([xx, yy], axis=-1), vals


def decode_argmax_subpixel(heatmaps: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Argmax decode + per-axis quadratic peak refinement (the classic
    sub-pixel fit): around the integer peak p, a parabola through
    (f(p-1), f(p), f(p+1)) has its maximum at p + (f(p+1)-f(p-1)) /
    (2*(2f(p)-f(p+1)-f(p-1))). For Gaussian-trained heatmaps at 1/4 input
    resolution this removes most of the ~2 px quantization floor of the
    integer decode. Returns ((B, K, 2) xy in [0,1] by (size-1), (B, K)
    peak values)."""
    b, h, w, k = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat = hm.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (B, K)
    vals = jnp.max(flat, axis=1)
    py = idx // w
    px = idx % w

    def at(yy, xx):  # gather f at clamped integer coords, (B, K)
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[:, None, :], axis=1)[:, 0]

    def refine(minus, plus, interior):
        denom = 2.0 * vals - plus - minus
        off = jnp.where(
            interior & (jnp.abs(denom) > 1e-6),
            0.5 * (plus - minus) / jnp.where(denom == 0, 1.0, denom),
            0.0,
        )
        return jnp.clip(off, -0.5, 0.5)

    # border peaks keep the integer decode: a clamped neighbor equals the
    # peak itself and the parabola degenerates to a spurious ±0.5 offset
    off_x = refine(at(py, px - 1), at(py, px + 1), (px > 0) & (px < w - 1))
    off_y = refine(at(py - 1, px), at(py + 1, px), (py > 0) & (py < h - 1))
    xx01 = (px.astype(jnp.float32) + off_x) / (w - 1)
    yy01 = (py.astype(jnp.float32) + off_y) / (h - 1)
    return jnp.stack([xx01, yy01], axis=-1), vals


def decode_soft_argmax(
    heatmaps: jax.Array, temperature: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable sub-pixel decode: softmax over the spatial grid,
    expectation of coordinates. Returns ((B, K, 2) xy in [0,1], (B, K) peak
    values)."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k).astype(jnp.float32)
    probs = jax.nn.softmax(flat * temperature, axis=1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1) / (h - 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1) / (w - 1)
    ex = jnp.einsum("bpk,p->bk", probs, xs)
    ey = jnp.einsum("bpk,p->bk", probs, ys)
    vals = jnp.max(flat, axis=1)
    return jnp.stack([ex, ey], axis=-1), vals


def extract_peaks(
    heatmaps: jax.Array, threshold: float = 0.3
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Inference-style peak extraction: sub-pixel argmax decode + validity
    mask by confidence threshold (inference_test.py:221-255). Returns
    (coords01, confidences, valid)."""
    coords, vals = decode_argmax_subpixel(heatmaps)
    return coords, vals, vals >= threshold


def coords01_to_pixels(coords01: jax.Array, image_hw: Tuple[int, int]) -> jax.Array:
    """[0,1] normalized xy -> pixel xy for (H, W) image, scaling by (size-1)
    (CornerMetrics convention, metrics.py:55-60 uses size; the model decode
    uses size-1 — we standardize on size-1 round-trip consistency)."""
    h, w = image_hw
    return coords01 * jnp.asarray([w - 1, h - 1], jnp.float32)


def pixels_to_heatmap_coords(
    pixels_xy: jax.Array, image_hw: Tuple[int, int], heatmap_hw: Tuple[int, int]
) -> jax.Array:
    """Image-pixel xy -> heatmap-pixel xy (for Gaussian target rendering).
    Negative (missing) coordinates stay negative."""
    ih, iw = image_hw
    hh, hw = heatmap_hw
    scale = jnp.asarray([(hw - 1) / (iw - 1), (hh - 1) / (ih - 1)], jnp.float32)
    scaled = pixels_xy * scale
    return jnp.where(jnp.all(pixels_xy >= 0, axis=-1, keepdims=True), scaled, -1.0)
