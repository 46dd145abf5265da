"""JAX-native procedural synthetic card renderer — the TPU-first replacement
for the reference's BlenderProc/Cycles generator
(dataset_generator/generate_synthetic.py).

The reference renders physical card meshes offline on CPU/GPU Blender
(63x88 mm card, bevel-rounded corners :123-187; random camera pose :252-324;
HDRI lighting :326-361; binary 255-mask output :397-454) and writes
image/mask PNGs to disk. Here the whole thing is a closed-form, fully-fused
program that runs *on the TPU inside the input pipeline*:

- card coverage is a rounded-rect SDF evaluated in card-space (the mesh
  bevel becomes an analytic corner radius),
- the camera pose becomes a random perspective homography (4 jittered
  corners -> DLT solve on device),
- texture and background are procedural functions of (u, v) — border frame,
  art box, title/text bands, sinusoidal mottling — no texture fetch at all,
- HDRI lighting becomes a low-frequency illumination field + vignette.

Every sample is pure f(key) -> (image, mask, corners), so data generation
shards over the mesh with the training step and never touches the host.
~9% of samples are card-free negatives, mirroring the reference's background
negatives (800/8800, dataset_generator/04_random_background_downloader.py).

Corners are emitted in image-space clockwise-from-top-left order
TL, TR, BR, BL (canonicalize_corners) — the order the reference's
corner_annotations.json contract uses (train/preprocess_masks.py:196-223,
mask-derived, hence image-space).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mtg_card_image_segmentation_tpu.data import warp as W

# physical card geometry (mm) — generate_synthetic.py:63-67
CARD_W_MM = 63.0
CARD_H_MM = 88.0
CORNER_RADIUS_MM = 3.0
NEGATIVE_PROB = 0.09  # ~800/8800 background-only samples


class SyntheticSample(NamedTuple):
    image: jax.Array  # (H, W, 3) float32 in [0, 1]
    mask: jax.Array  # (H, W) int32 {0, 1}
    corners: jax.Array  # (4, 2) xy pixels, TL TR BR BL; -1 when no card
    has_card: jax.Array  # () bool


class AssetBank(NamedTuple):
    """Device-resident real-asset library for the renderer: actual card
    scans as textures + real photos as backgrounds (the reference's realism
    path — Scryfall scans, dataset_generator/generate_synthetic.py:189-249,
    and Lorem Picsum negatives, 04_random_background_downloader.py). Loaded
    once on host (load_asset_bank), then every sample composites them
    on-device through the same homography/SDF machinery as the procedural
    path."""

    textures: jax.Array  # (Nt, Th, Tw, 3) float32 [0,1], card aspect H:W=88:63
    backgrounds: jax.Array  # (Nb, Bh, Bw, 3) float32 [0,1]
    # equirect HDRI environments (downloaders.PolyhavenHDRIDownloader output;
    # the reference lights every render with one, generate_synthetic.py:326-361)
    # host-numpy defaults: a jnp default here would initialize the JAX
    # backend at import time and break jax.distributed.initialize() in the
    # multi-host trainers (it must run before any JAX computation)
    hdris: jax.Array = np.zeros((0, 64, 128, 3), np.float32)  # tone-mapped [0,1]
    # blurred mean-1.0 illumination fields derived from hdris at load time
    hdri_light: jax.Array = np.zeros((0, 16, 32, 3), np.float32)


def load_asset_bank(
    texture_dir: str,
    background_dir: str | None = None,
    tex_hw: tuple[int, int] = (352, 256),
    bg_hw: tuple[int, int] = (480, 640),
    max_assets: int = 512,
    hdri_dir: str | None = None,
    hdri_hw: tuple[int, int] = (64, 128),
) -> AssetBank:
    """Host-decode card scans / background photos / HDRI maps into a device
    bank.

    Reads every jpg/png (and, for ``hdri_dir``, .hdr/.exr Radiance maps via
    cv2 float decode) under each directory (recursively), resizes textures
    to the card aspect (88:63) and backgrounds to ``bg_hw``. Any directory
    may be empty/None — the renderer falls back to procedural for the
    missing kind. HDRIs are Reinhard-tone-mapped to [0,1] for background
    use; a blurred mean-normalized copy becomes the illumination field
    (the reference's HDRI world lighting, strength 0.8-1.5,
    generate_synthetic.py:326-361).
    """
    import os

    import cv2
    import numpy as np

    def load_dir(d, hw, hdr=False):
        if not d or not os.path.isdir(d):
            return np.zeros((0, hw[0], hw[1], 3), np.float32)
        exts = (".jpg", ".jpeg", ".png", ".hdr", ".exr") if hdr else (
            ".jpg", ".jpeg", ".png")
        paths = []
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.lower().endswith(exts):
                    paths.append(os.path.join(root, f))
        out = []
        for p in paths[:max_assets]:
            flags = (
                cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR if hdr else cv2.IMREAD_COLOR
            )
            img = cv2.imread(p, flags)
            if img is None:
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
            if p.lower().endswith((".hdr", ".exr")):
                img = img / (1.0 + img)  # Reinhard: radiance -> [0,1)
            else:
                img = img / 255.0
            img = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)
            out.append(np.clip(img, 0.0, 1.0))
        if not out:
            return np.zeros((0, hw[0], hw[1], 3), np.float32)
        return np.stack(out)

    hdris = load_dir(hdri_dir, hdri_hw, hdr=True)
    if hdris.shape[0]:
        # illumination field: blur to low frequency, normalize mean to 1.0
        light = np.stack([
            cv2.GaussianBlur(
                cv2.resize(im, (32, 16), interpolation=cv2.INTER_AREA),
                (5, 5), 2.0,
            )
            for im in hdris
        ])
        light = light / np.maximum(
            light.mean(axis=(1, 2, 3), keepdims=True), 1e-3
        )
    else:
        light = np.zeros((0, 16, 32, 3), np.float32)

    return AssetBank(
        textures=jnp.asarray(load_dir(texture_dir, tex_hw)),
        backgrounds=jnp.asarray(load_dir(background_dir, bg_hw)),
        hdris=jnp.asarray(hdris),
        hdri_light=jnp.asarray(light),
    )


def _rounded_rect_sdf(u: jax.Array, v: jax.Array) -> jax.Array:
    """Signed distance (mm) to the rounded card rectangle, card space uv in
    [0,1]^2 -> mm coords."""
    px = u * CARD_W_MM - CARD_W_MM / 2.0
    py = v * CARD_H_MM - CARD_H_MM / 2.0
    half = jnp.array([CARD_W_MM / 2.0, CARD_H_MM / 2.0]) - CORNER_RADIUS_MM
    qx = jnp.abs(px) - half[0]
    qy = jnp.abs(py) - half[1]
    outside = jnp.sqrt(jnp.maximum(qx, 0.0) ** 2 + jnp.maximum(qy, 0.0) ** 2)
    inside = jnp.minimum(jnp.maximum(qx, qy), 0.0)
    return outside + inside - CORNER_RADIUS_MM


def _band(x: jax.Array, lo: float, hi: float, soft: float = 0.01) -> jax.Array:
    """Smooth indicator of lo <= x <= hi."""
    return jax.nn.sigmoid((x - lo) / soft) * jax.nn.sigmoid((hi - x) / soft)


def _card_texture(key: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Procedural MTG-like face: border frame, title band, art box, text box,
    mottled art noise. Returns (..., 3) in [0,1]."""
    keys = jax.random.split(key, 6)
    border_col = jax.random.uniform(keys[0], (3,), minval=0.0, maxval=0.15)
    frame_col = jax.random.uniform(keys[1], (3,), minval=0.2, maxval=0.9)
    art_col = jax.random.uniform(keys[2], (3,), minval=0.1, maxval=0.9)
    art_col2 = jax.random.uniform(keys[3], (3,), minval=0.1, maxval=0.9)
    text_col = jax.random.uniform(keys[4], (3,), minval=0.7, maxval=0.95)
    f1, f2, p1, p2 = jax.random.uniform(keys[5], (4,), minval=0.0, maxval=1.0)

    inner = _band(u, 0.045, 0.955) * _band(v, 0.035, 0.965)
    art = _band(u, 0.08, 0.92) * _band(v, 0.11, 0.54)
    text = _band(u, 0.08, 0.92) * _band(v, 0.60, 0.92)
    title = _band(u, 0.08, 0.92) * _band(v, 0.045, 0.095)

    # sinusoidal "artwork"
    wave = 0.5 + 0.5 * jnp.sin(
        (6.0 + 10.0 * f1) * u + (6.0 + 10.0 * f2) * v + p1 * 6.28
    ) * jnp.sin((4.0 + 8.0 * f2) * v - (3.0 + 6.0 * f1) * u + p2 * 6.28)
    art_tex = art_col * wave[..., None] + art_col2 * (1.0 - wave[..., None])

    color = border_col
    color = color * (1 - inner[..., None]) + frame_col * inner[..., None]
    color = color * (1 - art[..., None]) + art_tex * art[..., None]
    color = color * (1 - text[..., None]) + text_col * text[..., None]
    color = color * (1 - title[..., None]) + (frame_col * 0.6) * title[..., None]
    # faint text lines in the text box
    lines = 0.5 + 0.5 * jnp.sin(v * 300.0)
    color = color - 0.12 * (text * (lines > 0.6))[..., None]
    return jnp.clip(color, 0.0, 1.0)


def _background_at(
    key: jax.Array, y: jax.Array, x: jax.Array, h: int, w: int
) -> jax.Array:
    """Random gradient + sinusoidal mottling + noise (stand-in for Lorem
    Picsum photos / HDRI environments), evaluated at coordinate maps (y, x)
    so augmentation geometry can compose into the render."""
    keys = jax.random.split(key, 6)
    c0 = jax.random.uniform(keys[0], (3,))
    c1 = jax.random.uniform(keys[1], (3,))
    ang = jax.random.uniform(keys[2], minval=0.0, maxval=2 * jnp.pi)
    t = (x / w) * jnp.cos(ang) + (y / h) * jnp.sin(ang)
    # normalization bounds of the *un-warped* field (t over [0,1]^2 coords):
    # min/max of a linear field over the unit square, closed form
    t_lo = jnp.minimum(jnp.cos(ang), 0.0) + jnp.minimum(jnp.sin(ang), 0.0)
    t_hi = jnp.maximum(jnp.cos(ang), 0.0) + jnp.maximum(jnp.sin(ang), 0.0)
    t = (t - t_lo) / (t_hi - t_lo + 1e-8)
    grad = c0 * t[..., None] + c1 * (1.0 - t[..., None])
    f = jax.random.uniform(keys[3], (4,), minval=1.0, maxval=8.0)
    mottle = 0.5 + 0.25 * jnp.sin(f[0] * x / w * 6.28 + f[1]) * jnp.sin(
        f[2] * y / h * 6.28 + f[3]
    )
    noise = jax.random.uniform(keys[4], y.shape + (1,), minval=-0.04, maxval=0.04)
    return jnp.clip(grad * mottle[..., None] + noise, 0.0, 1.0)


def _background(key: jax.Array, h: int, w: int) -> jax.Array:
    y, x = W.identity_grid(h, w)
    return _background_at(key, y, x, h, w)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 6))
def synthetic_sample(
    key: jax.Array, h: int = 320, w: int = 240,
    negative_prob: float = NEGATIVE_PROB,
    assets: AssetBank | None = None, real_prob: float = 0.7,
    keep_in_frame: bool = False,
) -> SyntheticSample:
    """Render one (h, w) synthetic scene. ``negative_prob=0`` guarantees a
    card (the pose pipelines train only on card images, matching the
    reference's corner_annotations contract). With ``assets``, real card
    scans / photo backgrounds composite in with probability ``real_prob``.

    ``keep_in_frame`` guarantees all 4 corners land inside the image (the
    keypoint pipelines' contract: the reference's annotations are derived
    from visible masks of fully-in-view Blender renders,
    generate_synthetic.py:252-324, so no GT corner is ever off-screen)."""
    return _render_scene(
        key, h, w, negative_prob, None, None, assets, real_prob, keep_in_frame
    )


def _render_scene(
    key: jax.Array, h: int, w: int, negative_prob: float,
    src_y, src_x, assets: AssetBank | None = None, real_prob: float = 0.7,
    keep_in_frame: bool = False,
) -> SyntheticSample:
    """Core renderer. When ``src_y/src_x`` are given (augmentation-composed
    source-coordinate maps), the whole scene is evaluated *at those source
    coordinates* — geometrically identical to rendering then inverse-warping,
    but with zero gathers: every layer (background, texture, lighting) is a
    closed-form function of coordinates, so augmentation geometry composes
    into the render for free. The (4,2) ``corners`` returned are in *render*
    space; callers composing a forward transform map them separately."""
    (k_bg, k_tex, k_scale, k_rot, k_pos, k_persp, k_light, k_neg, k_exp,
     k_asset, k_real) = jax.random.split(key, 11)

    if src_y is None:
        src_y, src_x = W.identity_grid(h, w)
    background = _background_at(k_bg, src_y, src_x, h, w)

    if assets is not None and assets.backgrounds.shape[0] > 0:
        # real photo background: sample the chosen bank image at the (possibly
        # augmentation-composed) source coordinates — the gather is the price
        # of real pixels; procedural layers stay closed-form
        nb = assets.backgrounds.shape[0]
        bh, bw = assets.backgrounds.shape[1], assets.backgrounds.shape[2]
        b_idx = jax.random.randint(jax.random.fold_in(k_asset, 0), (), 0, nb)
        bg_real = W.warp_bilinear(
            assets.backgrounds[b_idx],
            src_y * ((bh - 1.0) / max(h - 1, 1)),
            src_x * ((bw - 1.0) / max(w - 1, 1)),
        )
        use_real_bg = jax.random.bernoulli(
            jax.random.fold_in(k_real, 0), real_prob
        )
        background = jnp.where(use_real_bg, bg_real, background)

    if assets is not None and assets.hdris.shape[0] > 0:
        # HDRI environment as background: equirect sampled with a random
        # horizontal rotation (the reference's random world rotation,
        # generate_synthetic.py:326-361), wrap in x
        ne = assets.hdris.shape[0]
        eh, ew = assets.hdris.shape[1], assets.hdris.shape[2]
        e_idx = jax.random.randint(jax.random.fold_in(k_asset, 2), (), 0, ne)
        rot = jax.random.uniform(jax.random.fold_in(k_asset, 3))
        ex = jnp.mod(src_x / max(w - 1, 1) * 0.5 + rot, 1.0) * (ew - 1.0)
        ey = jnp.clip(src_y / max(h - 1, 1), 0.0, 1.0) * (eh - 1.0)
        bg_hdri = W.warp_bilinear(assets.hdris[e_idx], ey, ex)
        use_hdri_bg = jax.random.bernoulli(
            jax.random.fold_in(k_real, 2),
            real_prob * (0.5 if assets.backgrounds.shape[0] > 0 else 1.0),
        )
        background = jnp.where(use_hdri_bg, bg_hdri, background)

    # --- card placement: rect corners -> rotate -> translate -> perspective jitter
    # keep_in_frame caps the scale so even a diagonal card fits (card
    # diag = 1.23 * card_h; 0.72 * 1.23 < 0.9) before the shift below
    scale = jax.random.uniform(
        k_scale, minval=0.35, maxval=0.72 if keep_in_frame else 0.95
    )
    card_h_px = scale * min(h, w)
    card_w_px = card_h_px * (CARD_W_MM / CARD_H_MM)
    angle = jax.random.uniform(k_rot, minval=0.0, maxval=2 * jnp.pi)
    cx = w / 2.0 + jax.random.uniform(k_pos, minval=-0.2, maxval=0.2) * w
    cy = h / 2.0 + jax.random.uniform(jax.random.fold_in(k_pos, 1), minval=-0.2, maxval=0.2) * h

    base = jnp.array(  # TL TR BR BL in card frame, centered
        [
            [-card_w_px / 2, -card_h_px / 2],
            [card_w_px / 2, -card_h_px / 2],
            [card_w_px / 2, card_h_px / 2],
            [-card_w_px / 2, card_h_px / 2],
        ]
    )
    rot = jnp.array(
        [[jnp.cos(angle), -jnp.sin(angle)], [jnp.sin(angle), jnp.cos(angle)]]
    )
    corners = base @ rot.T + jnp.array([cx, cy])
    # perspective: per-corner jitter up to 6% of card size (camera Y 45-135deg)
    jit = jax.random.uniform(k_persp, (4, 2), minval=-0.06, maxval=0.06)
    corners = corners + jit * jnp.array([card_w_px, card_h_px])

    if keep_in_frame:
        # translate the quad fully inside the frame (2px margin): off-screen
        # corners are unobservable for heatmap decoding and never occur in
        # the reference's mask-derived annotations
        margin = 2.0
        lim = jnp.array([w - 1.0, h - 1.0])
        shift = jnp.maximum(0.0, margin - corners.min(axis=0)) - jnp.maximum(
            0.0, corners.max(axis=0) - (lim - margin)
        )
        corners = corners + shift

    # homography: card uv unit square -> image corners; inverse for sampling
    src_uv = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    h_inv = W.homography_from_points(corners, src_uv)

    y, x = src_y, src_x
    pts = jnp.stack([x, y], axis=-1).reshape(-1, 2)
    uv = W.transform_points(h_inv, pts).reshape(x.shape + (2,))
    u, v = uv[..., 0], uv[..., 1]

    # anti-aliased coverage: SDF in mm -> pixels
    mm_per_px = CARD_H_MM / jnp.maximum(card_h_px, 1.0)
    sdf_px = _rounded_rect_sdf(u, v) / mm_per_px
    alpha = jnp.clip(0.5 - sdf_px, 0.0, 1.0)

    # negatives: drop the card entirely ~negative_prob of the time
    has_card = jnp.logical_not(jax.random.bernoulli(k_neg, negative_prob))
    alpha = alpha * has_card.astype(jnp.float32)

    card_rgb = _card_texture(k_tex, u, v)
    if assets is not None and assets.textures.shape[0] > 0:
        # real card scan as texture: sample at card-space uv through the same
        # homography (generate_synthetic.py:189-249 uses the actual Scryfall
        # scan on the card mesh)
        nt = assets.textures.shape[0]
        th, tw = assets.textures.shape[1], assets.textures.shape[2]
        t_idx = jax.random.randint(jax.random.fold_in(k_asset, 1), (), 0, nt)
        tex_real = W.warp_bilinear(
            assets.textures[t_idx],
            jnp.clip(v, 0.0, 1.0) * (th - 1.0),
            jnp.clip(u, 0.0, 1.0) * (tw - 1.0),
        )
        use_real_tex = jax.random.bernoulli(
            jax.random.fold_in(k_real, 1), real_prob
        )
        card_rgb = jnp.where(use_real_tex, tex_real, card_rgb)
    img = background * (1.0 - alpha[..., None]) + card_rgb * alpha[..., None]

    # illumination: low-frequency light field + vignette + exposure
    lk = jax.random.split(k_light, 5)
    lx = jax.random.uniform(lk[0], minval=0.0, maxval=1.0)
    ly = jax.random.uniform(lk[1], minval=0.0, maxval=1.0)
    d2 = ((x / w) - lx) ** 2 + ((y / h) - ly) ** 2
    light = (1.15 - 0.5 * jnp.sqrt(d2))[..., None] * jnp.ones((3,))
    if assets is not None and assets.hdri_light.shape[0] > 0:
        # HDRI world illumination: every render lit by a random environment
        # at strength 0.8-1.5 with random rotation — the reference's
        # lighting model (generate_synthetic.py:326-361). The blurred
        # mean-1.0 field gives colored, directional low-frequency light.
        ne = assets.hdri_light.shape[0]
        lh, lw = assets.hdri_light.shape[1], assets.hdri_light.shape[2]
        l_idx = jax.random.randint(lk[2], (), 0, ne)
        l_rot = jax.random.uniform(lk[3])
        strength = jax.random.uniform(lk[4], minval=0.8, maxval=1.5)
        gx = jnp.mod(x / max(w - 1, 1) * 0.5 + l_rot, 1.0) * (lw - 1.0)
        gy = jnp.clip(y / max(h - 1, 1), 0.0, 1.0) * (lh - 1.0)
        hdr_field = W.warp_bilinear(assets.hdri_light[l_idx], gy, gx)
        # blend toward neutral so strength scales contrast as well as level
        light = strength * (0.5 + 0.5 * hdr_field)
    exposure = jax.random.uniform(k_exp, minval=0.85, maxval=1.15)
    img = jnp.clip(img * light * exposure, 0.0, 1.0)

    mask = (alpha > 0.5).astype(jnp.int32)
    corners = canonicalize_corners(corners)
    corners_out = jnp.where(has_card, corners, -jnp.ones_like(corners))
    return SyntheticSample(img, mask, corners_out, has_card)


def canonicalize_corners(corners: jax.Array) -> jax.Array:
    """Reorder a (4, 2) xy quad to image-space clockwise-from-top-left
    (TL, TR, BR, BL) — the reference's corner-annotation contract
    (train/preprocess_masks.py:196-223 sorts mask-derived corners clockwise
    starting at the top-left *in the image*).

    The renderer places corners in card-frame order; for a card rotated past
    ~90° that disagrees with what a mask-derived annotation would say, and
    since card orientation is not observable from the mask, labeling in card
    frame makes the keypoint task ill-posed for upside-down cards (measured:
    ~9% gross corner errors on clean val data before this canonicalization).
    Ascending atan2 around the centroid is clockwise when y points down;
    the cycle is rolled so min(x+y) (top-left) comes first."""
    c = jnp.mean(corners, axis=0)
    ang = jnp.arctan2(corners[:, 1] - c[1], corners[:, 0] - c[0])
    pts = corners[jnp.argsort(ang)]
    start = jnp.argmin(jnp.sum(pts, axis=1))
    return pts[(start + jnp.arange(4)) % 4]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 7))
def synthetic_batch(
    key: jax.Array, batch: int, h: int = 320, w: int = 240,
    negative_prob: float = NEGATIVE_PROB,
    assets: AssetBank | None = None, real_prob: float = 0.7,
    keep_in_frame: bool = False,
) -> SyntheticSample:
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: synthetic_sample(
            k, h, w, negative_prob, assets, real_prob, keep_in_frame
        )
    )(keys)


def synthetic_augmented_sample(
    key: jax.Array, h: int, w: int, negative_prob: float, aug_cfg,
    with_displacement: bool = True,
    flip_idx=None,
    assets: AssetBank | None = None, real_prob: float = 0.7,
    keep_in_frame: bool = False,
) -> SyntheticSample:
    """Render one scene with the augmentation suite's geometry composed
    directly into the render coordinates — ZERO gathers.

    Equivalent to ``augment_sample(k, *synthetic_sample(k'))`` for the
    geometric part (hflip/affine/elastic/grid from data/augment.py, same
    probability gating), but ~18x faster on TPU because the per-pixel
    bilinear gather (measured 539 ms/batch at 24x480x640) disappears: the
    scene layers are all closed-form functions of coordinates, so we
    evaluate them at the inverse-augmentation coordinates instead of
    resampling a rendered image. Zero-border semantics (cv2 BORDER_CONSTANT,
    train/dataset.py:127,135) are reproduced with an in-bounds validity mask.
    Color ops still run per-pixel afterwards (they are cheap VPU code).

    ``with_displacement=False`` mirrors the keypoint-aware path (elastic/
    grid disabled so corners stay exact, like augment_sample with keypoints).
    """
    from mtg_card_image_segmentation_tpu.data.augment import (
        _color_ops,
        _displacement_fields,
        _geometry_matrix,
    )

    k_scene, k_geo, k_disp, k_color = jax.random.split(key, 4)

    m_fwd, _did_flip = _geometry_matrix(k_geo, h, w, aug_cfg)
    m_inv = W.invert_affine(m_fwd)
    src_y, src_x = W.apply_homography_grid(m_inv, h, w)
    if with_displacement:
        dy, dx = _displacement_fields(k_disp, h, w, aug_cfg)
        src_y = src_y + dy
        src_x = src_x + dx

    sample = _render_scene(
        k_scene, h, w, negative_prob, src_y, src_x, assets, real_prob,
        keep_in_frame,
    )

    # zero-border: outside the source frame the warp reads nothing
    valid = (
        (src_y >= 0.0) & (src_y <= h - 1.0) & (src_x >= 0.0) & (src_x <= w - 1.0)
    )
    image = jnp.where(valid[..., None], sample.image, 0.0)
    mask = jnp.where(valid, sample.mask, 0)

    # corners move through the forward transform (exact, not resampled);
    # re-canonicalize afterwards — a flip reverses the winding and a
    # rotation can move a different corner into the top-left position, and
    # labels are image-space (flip_idx reordering alone only covers the
    # axis-aligned case, *_yolo12n/model.py:344-374 flip_idx: [1,0,3,2])
    corners = W.transform_points(m_fwd, sample.corners)
    corners = canonicalize_corners(corners)
    corners = jnp.where(sample.has_card, corners, -jnp.ones_like(corners))

    image = _color_ops(k_color, image, aug_cfg)
    return SyntheticSample(image, mask, corners, sample.has_card)


def synthetic_augmented_batch(
    key: jax.Array, batch: int, h: int, w: int, negative_prob: float,
    aug_cfg, with_displacement: bool = True, flip_idx=None,
    assets: AssetBank | None = None, real_prob: float = 0.7,
    keep_in_frame: bool = False,
) -> SyntheticSample:
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: synthetic_augmented_sample(
            k, h, w, negative_prob, aug_cfg, with_displacement, flip_idx,
            assets, real_prob, keep_in_frame,
        )
    )(keys)
