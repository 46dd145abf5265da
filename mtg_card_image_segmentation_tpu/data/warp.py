"""Inverse-warp samplers — the geometric core of the on-device augmentation
suite and the synthetic renderer.

The reference does all geometry on CPU workers via albumentations/OpenCV
(train/dataset.py:100-187). Here a single gather-based bilinear/nearest
sampler runs on the VPU; every geometric transform (affine, perspective,
elastic, grid distortion) reduces to "build a source-coordinate field, warp".
Out-of-bounds samples return 0 (cv2 BORDER_CONSTANT, the reference's border
mode for elastic/grid, train/dataset.py:127,135).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img (H,W,C) indexed at integer (iy, ix) maps (h,w) -> (h,w,C), with
    clamped indices (validity is handled by the caller's mask)."""
    h, w = img.shape[0], img.shape[1]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return img[iy, ix]


def warp_bilinear(img: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Sample (H,W,C) ``img`` at float source coords (h,w) maps, bilinear,
    zero outside. Returns (h,w,C) float32."""
    img = img.astype(jnp.float32)
    y0 = jnp.floor(src_y).astype(jnp.int32)
    x0 = jnp.floor(src_x).astype(jnp.int32)
    wy = src_y - y0
    wx = src_x - x0

    v00 = _gather_2d(img, y0, x0)
    v01 = _gather_2d(img, y0, x0 + 1)
    v10 = _gather_2d(img, y0 + 1, x0)
    v11 = _gather_2d(img, y0 + 1, x0 + 1)

    top = v00 + (v01 - v00) * wx[..., None]
    bot = v10 + (v11 - v10) * wx[..., None]
    out = top + (bot - top) * wy[..., None]

    h, w = img.shape[0], img.shape[1]
    valid = (
        (src_y >= 0.0) & (src_y <= h - 1.0) & (src_x >= 0.0) & (src_x <= w - 1.0)
    )
    return jnp.where(valid[..., None], out, 0.0)


def warp_nearest(img: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Nearest-neighbor warp for masks/labels, zero outside. (h,w[,C])."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    out = _gather_2d(img, iy, ix)
    h, w = img.shape[0], img.shape[1]
    valid = (
        (src_y >= -0.5) & (src_y < h - 0.5) & (src_x >= -0.5) & (src_x < w - 0.5)
    )
    out = jnp.where(valid[..., None], out, 0)
    return out[..., 0] if squeeze else out


def identity_grid(h: int, w: int) -> tuple[jax.Array, jax.Array]:
    """(y, x) coordinate maps of shape (h, w)."""
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return y, x


def apply_homography_grid(
    matrix: jax.Array, h: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """Source coords for inverse-warping by a 3x3 homography ``matrix``
    mapping *output* (x, y, 1) -> *source* (x', y', w')."""
    y, x = identity_grid(h, w)
    ones = jnp.ones_like(x)
    sx = matrix[0, 0] * x + matrix[0, 1] * y + matrix[0, 2] * ones
    sy = matrix[1, 0] * x + matrix[1, 1] * y + matrix[1, 2] * ones
    sw = matrix[2, 0] * x + matrix[2, 1] * y + matrix[2, 2] * ones
    sw = jnp.where(jnp.abs(sw) < 1e-8, 1e-8, sw)
    return sy / sw, sx / sw


def affine_matrix(
    translate_yx: jax.Array,
    scale: jax.Array,
    angle_rad: jax.Array,
    center_yx: tuple[float, float],
) -> jax.Array:
    """Forward 3x3 affine in (x, y) convention: rotate+scale about center,
    then translate (albumentations A.Affine order)."""
    cy, cx = center_yx
    cos = jnp.cos(angle_rad) * scale
    sin = jnp.sin(angle_rad) * scale
    ty, tx = translate_yx[0], translate_yx[1]
    # x' = cos*(x-cx) - sin*(y-cy) + cx + tx ; y' = sin*(x-cx) + cos*(y-cy) + cy + ty
    return jnp.array(
        [
            [cos, -sin, cx + tx - cos * cx + sin * cy],
            [sin, cos, cy + ty - sin * cx - cos * cy],
            [0.0, 0.0, 1.0],
        ]
    )


def invert_affine(m: jax.Array) -> jax.Array:
    """Closed-form inverse of a 3x3 affine (last row 0 0 1)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    det = a * e - b * d
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    return jnp.array(
        [
            [ia, ib, -(ia * c + ib * f)],
            [id_, ie, -(id_ * c + ie * f)],
            [0.0, 0.0, 1.0],
        ]
    )


def transform_points(m: jax.Array, pts_xy: jax.Array) -> jax.Array:
    """Apply 3x3 homography to (N, 2) xy points (forward direction)."""
    ones = jnp.ones((pts_xy.shape[0], 1), pts_xy.dtype)
    p = jnp.concatenate([pts_xy, ones], axis=-1)
    out = p @ m.T
    return out[:, :2] / jnp.where(jnp.abs(out[:, 2:3]) < 1e-8, 1e-8, out[:, 2:3])


def homography_from_points(src_xy: jax.Array, dst_xy: jax.Array) -> jax.Array:
    """3x3 H with dst ~ H @ src from 4 point pairs (DLT, solved on device)."""
    rows = []
    for i in range(4):
        x, y = src_xy[i, 0], src_xy[i, 1]
        u, v = dst_xy[i, 0], dst_xy[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y]))
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y]))
    a = jnp.stack(rows)
    b = dst_xy.reshape(-1)
    h8 = jnp.linalg.solve(a, b)
    return jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)


def gaussian_kernel_1d(sigma: jax.Array, radius: int) -> jax.Array:
    """Normalized 1-D Gaussian taps of static length 2*radius+1 (sigma may be
    traced)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jax.Array, sigma: jax.Array, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur of (H,W,C) with reflective-ish edge handling
    (SAME zero-pad + renormalization is close enough for augmentation)."""
    k = gaussian_kernel_1d(sigma, radius)
    x = img.astype(jnp.float32)
    x = jnp.moveaxis(x, -1, 0)[:, None]  # (C,1,H,W)
    ky = k.reshape(1, 1, -1, 1)
    kx = k.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn)
    return jnp.moveaxis(x[:, 0], 0, -1)
