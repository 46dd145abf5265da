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


def _quadratic_subpixel(flat, py, px, vals, h, w):
    """Per-axis quadratic peak refinement at integer peaks (B, K): around
    peak p, a parabola through (f(p-1), f(p), f(p+1)) has its maximum at
    p + (f(p+1)-f(p-1)) / (2*(2f(p)-f(p+1)-f(p-1))). Returns [0,1] coords
    by (size-1). Border peaks keep the integer decode: a clamped neighbor
    equals the peak itself and the parabola degenerates to ±0.5."""

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

    off_x = refine(at(py, px - 1), at(py, px + 1), (px > 0) & (px < w - 1))
    off_y = refine(at(py - 1, px), at(py + 1, px), (py > 0) & (py < h - 1))
    xx01 = (px.astype(jnp.float32) + off_x) / (w - 1)
    yy01 = (py.astype(jnp.float32) + off_y) / (h - 1)
    return jnp.stack([xx01, yy01], axis=-1)


def decode_argmax_subpixel(heatmaps: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Argmax decode + quadratic sub-pixel refinement. For Gaussian-trained
    heatmaps at 1/4 input resolution this removes most of the ~2 px
    quantization floor of the integer decode. Returns ((B, K, 2) xy in
    [0,1] by (size-1), (B, K) peak values)."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (B, K)
    vals = jnp.max(flat, axis=1)
    return _quadratic_subpixel(flat, idx // w, idx % w, vals, h, w), vals


def canonicalize_corners(kp: jax.Array) -> jax.Array:
    """Re-sort (B, K, C) corner rows (xy in the leading 2 of C) into
    canonical image order: by angle around the centroid, starting at the
    smallest x+y — i.e. TL, TR, BR, BL (preprocess_masks.py:196-223 order).
    Repairs pure corner-identity swaps; identity on already-ordered
    predictions."""
    ctr = jnp.mean(kp[..., :2], axis=1, keepdims=True)
    ang = jnp.arctan2(kp[..., 1] - ctr[..., 1], kp[..., 0] - ctr[..., 0])
    order = jnp.argsort(ang, axis=1)
    pts = jnp.take_along_axis(kp, order[..., None], axis=1)
    start = jnp.argmin(jnp.sum(pts[..., :2], axis=-1), axis=1)  # (B,)
    roll = (start[:, None] + jnp.arange(kp.shape[1])[None, :]) % kp.shape[1]
    return jnp.take_along_axis(pts, roll[..., None], axis=1)


def decode_joint_nms(
    heatmaps: jax.Array,
    num_candidates: int = 3,
    collision_px: float = 6.0,
) -> Tuple[jax.Array, jax.Array]:
    """Joint corner decode: per channel, ``num_candidates`` spatially
    distinct peaks (greedy NMS, radius ``collision_px`` heatmap px); then
    the best joint assignment over all n^K combinations by sum(conf) minus
    a collision penalty for coincident corners; quadratic sub-pixel
    refinement of the chosen peaks; canonical TL/TR/BR/BL reordering.

    Targets the independent-argmax failure mode where one corner channel
    peaks on ANOTHER corner's location (observed 1/384 eval images: a
    430 px miss with three perfect corners). Returns ((B, K, 2) xy in
    [0,1] by (size-1), (B, K) chosen-peak confidences).

    STATUS — measured NEGATIVE for the HRNet family, kept for reference:
    on the full 384-image eval this decode scored mean 1.23 px vs the
    independent sub-pixel decode's 0.95 px. Under MSE heatmap training a
    confused channel's secondary NMS peaks are diffuse noise (unlike the
    YOLO head's focal-trained per-corner confidences, where the same
    joint scheme took acc@5px from 98.9% to 99.9%): the identity-confused
    image only improved 430 -> 322 px while a few good corners regressed
    to noise peaks via the collision penalty. Round-4 measurement
    sharpened the diagnosis: the real tail image has a DEAD channel
    (global max 0.002), and its noise candidates poison the joint
    assignment — sum(conf)-penalty happily sacrifices good corners to
    dodge phantom collisions (321/295/243 px on three corners of the
    tail image). HRNet consumers therefore use
    :func:`decode_argmax_subpixel_gated`, which repairs dead channels
    geometrically (:func:`complete_dead_corner`) and reserves this joint
    decode for confident identity swaps only; the YOLO anchor-domain
    analog lives in models/yolo12_pose.py top1_detection."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).reshape(b, h * w, k)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)

    masked = flat
    picks = []
    for _ in range(num_candidates):
        idx = jnp.argmax(masked, axis=1)  # (B, K)
        picks.append(idx)
        sel_x = xs[idx]  # (B, K)
        sel_y = ys[idx]
        d2 = (xs[None, :, None] - sel_x[:, None, :]) ** 2 + (
            ys[None, :, None] - sel_y[:, None, :]
        ) ** 2  # (B, HW, K)
        masked = jnp.where(d2 < collision_px**2, -jnp.inf, masked)
    idx3 = jnp.stack(picks, axis=-1)  # (B, K, n)
    conf3 = jnp.take_along_axis(
        jnp.swapaxes(flat, 1, 2), idx3, axis=2
    )  # (B, K, n) original confidences
    x3 = xs[idx3]  # (B, K, n)
    y3 = ys[idx3]

    digits = []
    for c in range(num_candidates**k):
        q, row = c, []
        for _ in range(k):
            row.append(q % num_candidates)
            q //= num_candidates
        digits.append(row)
    combos = jnp.asarray(digits)  # (n^K, K)
    kk_idx = jnp.arange(k)[None, :]
    cx = x3[:, kk_idx, combos]  # (B, n^K, K)
    cy = y3[:, kk_idx, combos]
    cconf = conf3[:, kk_idx, combos]
    d2c = (cx[..., None, :] - cx[..., :, None]) ** 2 + (
        cy[..., None, :] - cy[..., :, None]
    ) ** 2  # (B, n^K, K, K)
    collide = (d2c < collision_px**2) & ~jnp.eye(k, dtype=bool)
    penalty = jnp.sum(collide, axis=(-1, -2)).astype(jnp.float32) * 10.0
    best = jnp.argmax(jnp.sum(cconf, axis=-1) - penalty, axis=1)  # (B,)
    rank = jnp.take_along_axis(combos[None], best[:, None, None], axis=1)[
        :, 0
    ]  # (B, K)
    idx_best = jnp.take_along_axis(idx3, rank[..., None], axis=2)[..., 0]  # (B, K)
    vals = jnp.take_along_axis(
        jnp.swapaxes(flat, 1, 2), idx_best[..., None], axis=2
    )[..., 0]
    coords01 = _quadratic_subpixel(
        flat, idx_best // w, idx_best % w, vals, h, w
    )
    ordered = canonicalize_corners(
        jnp.concatenate([coords01 * jnp.asarray([w - 1, h - 1]),
                         vals[..., None]], axis=-1)
    )
    coords01 = ordered[..., :2] / jnp.asarray([w - 1, h - 1])
    return coords01, ordered[..., 2]


def quad_plausible(
    corners_xy: jax.Array,
    min_dist: float = 4.0,
    min_area: float = 16.0,
) -> jax.Array:
    """(B, 4, 2) corner coords (TL, TR, BR, BL channel order) -> (B,) bool:
    does each decoded quadrilateral look like a card?

    Three independent sanity checks, all invariant to card rotation:
    - pairwise distinctness: no two corners within ``min_dist`` (a corner
      channel peaking on ANOTHER corner's location collapses two points),
    - canonical winding: the cross products of consecutive edges are all
      positive — TL->TR->BR->BL traverses any card clockwise in y-down
      image coords regardless of rotation. Adjacent-corner identity swaps
      self-intersect (mixed signs); opposite-corner swaps (TL<->BR) stay
      simple but reverse orientation (all-negative), so a plain
      consistency check would miss them,
    - non-degenerate area >= ``min_area`` (shoelace).

    Units follow the input coords (the decoders gate in heatmap pixels).
    """
    p = corners_xy.astype(jnp.float32)
    d2 = jnp.sum((p[:, :, None, :] - p[:, None, :, :]) ** 2, axis=-1)
    off_diag = ~jnp.eye(p.shape[1], dtype=bool)
    distinct = jnp.where(off_diag, d2, jnp.inf).min(axis=(1, 2)) >= min_dist**2
    e = jnp.roll(p, -1, axis=1) - p  # edges i -> i+1
    en = jnp.roll(e, -1, axis=1)
    cross = e[..., 0] * en[..., 1] - e[..., 1] * en[..., 0]  # (B, 4)
    convex = jnp.all(cross > 0, axis=1)
    area = 0.5 * jnp.abs(
        jnp.sum(p[..., 0] * jnp.roll(p, -1, axis=1)[..., 1]
                - jnp.roll(p, -1, axis=1)[..., 0] * p[..., 1], axis=1)
    )
    return distinct & convex & (area >= min_area)


def complete_dead_corner(
    coords: jax.Array,
    conf: jax.Array,
    dead_conf: float = 0.2,
    live_conf: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Parallelogram completion of a single dead corner channel.

    When a corner channel produces (essentially) no activation anywhere —
    the observed HRNet tail failure is a channel whose GLOBAL max is
    ~0.002 while the other three corners sit at ~0.94 — no heatmap decode
    can recover it: the joint-NMS assignment gets poisoned by the dead
    channel's noise peaks (measured on the real failure: it dragged two
    previously-perfect corners to 295/243 px errors). Geometry can: with
    three confident corners, the fourth is reconstructed as
    ``c[k] = c[k+1] + c[k-1] - c[k+2]`` (the affine/parallelogram
    completion; exact up to the render's perspective component, measured
    15.1 px on the real failure vs 413 px for the raw decode, and
    mean 19 px across all corners of the eval set — a last resort, hence
    the double confidence gate).

    Fires per corner only when ``conf[k] < dead_conf``, every OTHER corner
    clears ``live_conf``, and exactly one channel is dead (the measured
    confidence distribution is bimodal: 0.94 vs 0.002, so the gate is
    threshold-insensitive across 0.1-0.3 / 0.4-0.6). Coordinates may be
    normalized or pixel-valued — completion is linear, so it commutes
    with per-axis scaling. Returns (coords, fired (B, K) bool).
    """
    comp = (
        jnp.roll(coords, -1, axis=1)
        + jnp.roll(coords, 1, axis=1)
        - jnp.roll(coords, 2, axis=1)
    )
    k = coords.shape[1]
    dead = conf < dead_conf
    others = jnp.where(jnp.eye(k, dtype=bool)[None], jnp.inf, conf[:, None, :])
    others_live = jnp.min(others, axis=-1) > live_conf  # (B, K)
    fire = dead & others_live & (jnp.sum(dead, axis=1, keepdims=True) == 1)
    return jnp.where(fire[..., None], comp, coords), fire


def decode_argmax_subpixel_gated(
    heatmaps: jax.Array,
    num_candidates: int = 3,
    collision_px: float = 6.0,
    dead_conf: float = 0.2,
    live_conf: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Independent sub-pixel decode with two per-image gated repairs:
    dead-channel parallelogram completion, then a plausibility-gated
    fallback to the joint greedy-NMS decode.

    :func:`decode_argmax_subpixel` is the accuracy winner on well-formed
    heatmaps (0.94 px mean on the HRNet eval) but decodes each channel
    independently. Two observed/anticipated failure classes and their
    repairs, in order:

    1. **Dead channel** (the real 1/384 eval tail: global channel max
       0.002, decoded peak 413 px off): :func:`complete_dead_corner`
       reconstructs the corner from the three live ones. Measured on the
       full 384-image eval: mean 0.936 -> 0.677 px, max 413 -> 15.1 px,
       acc@20px 100%. The joint-NMS fallback alone made this WORSE
       (the dead channel's noise poisons the assignment: 321/295/243 px
       errors on three corners — round-4 measurement).
    2. **Confident identity swap** (a channel peaks hard on another
       corner's location, no dead channel): completion cannot fire, the
       quadrilateral fails :func:`quad_plausible`, and the image swaps to
       :func:`decode_joint_nms`, whose secondary-peak assignment repairs
       exactly this class.

    Images whose completed quadrilateral passes the gate keep their
    independent decode bit-identically. All branches trace
    unconditionally (no data-dependent control flow under jit); both
    repairs are tiny (K=4). Confidences are never rewritten by the
    completion — a reconstructed corner keeps its honest (dead) score, so
    detection-rate metrics still see the model's failure.
    """
    b, h, w, k = heatmaps.shape
    coords01, vals = decode_argmax_subpixel(heatmaps)
    coords01, _ = complete_dead_corner(
        coords01, vals, dead_conf=dead_conf, live_conf=live_conf
    )
    scale = jnp.asarray([w - 1, h - 1], jnp.float32)
    ok = quad_plausible(coords01 * scale)
    jcoords01, jvals = decode_joint_nms(
        heatmaps, num_candidates=num_candidates, collision_px=collision_px
    )
    coords = jnp.where(ok[:, None, None], coords01, jcoords01)
    conf = jnp.where(ok[:, None], vals, jvals)
    return coords, conf


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
