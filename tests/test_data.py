"""Data layer: synthetic renderer, augmentation suite, preprocessing,
filesystem pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import AugmentConfig
from mtg_card_image_segmentation_tpu.data import (
    augment_batch,
    augment_sample,
    preprocess_batch,
    synthetic_batch,
    synthetic_sample,
)
from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only


def _no_op_cfg(**overrides):
    base = dict(
        hflip_prob=0.0, affine_prob=0.0, elastic_prob=0.0, grid_distort_prob=0.0,
        color_jitter_prob=0.0, brightness_contrast_prob=0.0, noise_blur_prob=0.0,
    )
    base.update(overrides)
    return AugmentConfig(**base)


# --------------------------- synthetic renderer ---------------------------


def test_synthetic_sample_shapes_and_ranges():
    s = synthetic_sample(jax.random.key(0), 160, 120)
    assert s.image.shape == (160, 120, 3)
    assert s.mask.shape == (160, 120)
    assert s.corners.shape == (4, 2)
    img = np.asarray(s.image)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert set(np.unique(np.asarray(s.mask))) <= {0, 1}


def test_synthetic_deterministic():
    a = synthetic_sample(jax.random.key(7), 96, 96)
    b = synthetic_sample(jax.random.key(7), 96, 96)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_synthetic_mask_matches_corner_polygon():
    """cv2.fillPoly over the emitted corners must overlap the rendered mask
    (IoU > 0.9) — ties the mask and corner labels together."""
    cv2 = pytest.importorskip("cv2")
    hits = 0
    total = 0
    batch = synthetic_batch(jax.random.key(3), 16, 160, 120)
    for i in range(16):
        if not bool(batch.has_card[i]):
            continue
        total += 1
        mask = np.asarray(batch.mask[i], np.uint8)
        poly = np.asarray(batch.corners[i], np.float32)
        filled = np.zeros_like(mask)
        cv2.fillPoly(filled, [np.round(poly).astype(np.int32)], 1)
        inter = np.logical_and(mask, filled).sum()
        union = np.logical_or(mask, filled).sum()
        if union > 0 and inter / union > 0.9:
            hits += 1
    assert total >= 8  # ~91% should have cards
    assert hits == total, f"only {hits}/{total} samples had mask~polygon IoU>0.9"


def test_synthetic_negatives_have_empty_masks():
    batch = synthetic_batch(jax.random.key(11), 64, 96, 96)
    has = np.asarray(batch.has_card)
    masks = np.asarray(batch.mask)
    corners = np.asarray(batch.corners)
    assert (~has).sum() >= 1  # ~9% negatives in 64 draws
    for i in np.where(~has)[0]:
        assert masks[i].sum() == 0
        assert (corners[i] == -1).all()
    for i in np.where(has)[0]:
        assert masks[i].sum() > 0


# ------------------------------ augmentation ------------------------------


def test_augment_identity_when_disabled():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 24, 3)).astype(np.float32)
    mask = rng.integers(0, 2, (32, 24)).astype(np.int32)
    out = augment_sample(jax.random.key(0), jnp.asarray(img), jnp.asarray(mask), _no_op_cfg())
    np.testing.assert_allclose(np.asarray(out.image), img, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.mask), mask)


def test_augment_hflip_p1():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 12, 3)).astype(np.float32)
    mask = (img[..., 0] > 0.5).astype(np.int32)
    cfg = _no_op_cfg(hflip_prob=1.0)
    out = augment_sample(jax.random.key(0), jnp.asarray(img), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(out.image), img[:, ::-1], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.mask), mask[:, ::-1])


def test_augment_keypoints_follow_geometry():
    """Warped mask of a filled rect and the affine-transformed corners must
    agree: corners map to >0.9-IoU polygon of the warped mask."""
    cv2 = pytest.importorskip("cv2")
    h, w = 96, 96
    img = np.zeros((h, w, 3), np.float32)
    mask = np.zeros((h, w), np.int32)
    mask[30:70, 25:75] = 1
    img[..., 0] = mask
    kpts = np.array(
        [[25, 30], [74, 30], [74, 69], [25, 69]], np.float32
    )  # TL TR BR BL (xy)
    cfg = _no_op_cfg(hflip_prob=0.5, affine_prob=1.0, scale_range=(0.8, 1.2),
                     translate_percent=0.1)
    for seed in range(5):
        out = augment_sample(
            jax.random.key(seed), jnp.asarray(img), jnp.asarray(mask), cfg,
            keypoints=jnp.asarray(kpts),
        )
        m = np.asarray(out.mask, np.uint8)
        if m.sum() < 50:  # mostly out of frame
            continue
        poly = np.round(np.asarray(out.keypoints)).astype(np.int32)
        filled = np.zeros_like(m)
        cv2.fillPoly(filled, [poly], 1)
        # compare only in-frame region
        inter = np.logical_and(m, filled).sum()
        union = np.logical_or(m, filled).sum()
        assert inter / max(union, 1) > 0.85, f"seed {seed}: IoU {inter/union:.3f}"


def test_augment_color_changes_image_not_mask():
    rng = np.random.default_rng(2)
    img = rng.uniform(0.2, 0.8, (32, 32, 3)).astype(np.float32)
    mask = rng.integers(0, 2, (32, 32)).astype(np.int32)
    cfg = _no_op_cfg(color_jitter_prob=1.0, brightness_contrast_prob=1.0)
    out = augment_sample(jax.random.key(5), jnp.asarray(img), jnp.asarray(mask), cfg)
    assert not np.allclose(np.asarray(out.image), img, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out.mask), mask)
    assert np.asarray(out.image).min() >= 0 and np.asarray(out.image).max() <= 1


def test_augment_batch_distinct_per_sample():
    img = np.tile(np.linspace(0, 1, 24 * 24 * 3).reshape(24, 24, 3), (4, 1, 1, 1)).astype(np.float32)
    mask = np.ones((4, 24, 24), np.int32)
    out = augment_batch(jax.random.key(0), jnp.asarray(img), jnp.asarray(mask))
    a = np.asarray(out.image)
    assert not np.allclose(a[0], a[1])  # different per-sample keys


# ------------------------------ preprocessing ------------------------------


def test_preprocess_matches_reference_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 40, 30, 3), dtype=np.uint8)
    mask = rng.integers(0, 256, (2, 40, 30), dtype=np.uint8)
    x, m = preprocess_batch(jnp.asarray(img), jnp.asarray(mask), 32, 24)
    # torch oracle: resize bilinear half-pixel then normalize
    t = torch.from_numpy(img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    t = torch.nn.functional.interpolate(t, size=(32, 24), mode="bilinear", align_corners=False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    ref = ((t - mean) / std).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-4, atol=1e-4)
    assert set(np.unique(np.asarray(m))) <= {0, 1}


def test_normalize_only_roundtrip():
    img = np.full((1, 8, 8, 3), 0.5, np.float32)
    out = np.asarray(normalize_only(jnp.asarray(img)))
    expect = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


# ------------------------------ file pipeline ------------------------------


def test_file_pipeline_end_to_end(tmp_path, mesh8):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        img = rng.integers(0, 255, (48, 36, 3), dtype=np.uint8)
        mask = np.zeros((48, 36), np.uint8)
        mask[10:30, 8:28] = 255
        cv2.imwrite(str(img_dir / f"img_{i:03d}.jpg"), img)
        cv2.imwrite(str(mask_dir / f"img_{i:03d}.png"), mask)

    from mtg_card_image_segmentation_tpu.data.dataset import CardSegmentationDataset
    from mtg_card_image_segmentation_tpu.data.pipeline import FilePipeline

    ds = CardSegmentationDataset(str(img_dir), str(mask_dir))
    assert len(ds) == 10
    pipe = FilePipeline(
        ds, batch_size=8, height=32, width=24, mesh=mesh8,
        augment=AugmentConfig(), shuffle=True,
    )
    assert pipe.steps_per_epoch == 1
    batches = list(iter(pipe))
    assert len(batches) == 1
    images, masks, valid = batches[0]
    assert images.shape == (8, 32, 24, 3)
    assert masks.shape == (8, 32, 24)
    assert valid == 8
    assert str(images.sharding.spec) != "PartitionSpec()"


def test_synthetic_pipeline(mesh8):
    from mtg_card_image_segmentation_tpu.data.pipeline import SyntheticPipeline

    pipe = SyntheticPipeline(8, 64, 48, mesh=mesh8, seed=0)
    it = iter(pipe)
    images, masks = next(it)
    assert images.shape == (8, 64, 48, 3)
    assert masks.shape == (8, 64, 48)
    images2, _ = next(it)
    assert not np.allclose(np.asarray(images), np.asarray(images2))


def test_real_asset_compositing(tmp_path):
    """Real-asset bank: a solid-red card scan and solid-green background
    photo composite through the homography/SDF path — card pixels come from
    the texture, background pixels from the photo
    (dataset_generator/generate_synthetic.py:189-249 realism parity)."""
    import cv2

    from mtg_card_image_segmentation_tpu.data.synthetic import (
        load_asset_bank,
        synthetic_batch,
    )

    tex_dir = tmp_path / "tex"
    bg_dir = tmp_path / "bg"
    tex_dir.mkdir()
    bg_dir.mkdir()
    red = np.zeros((88, 63, 3), np.uint8)
    red[..., 2] = 255  # BGR red
    cv2.imwrite(str(tex_dir / "card.png"), red)
    green = np.zeros((60, 80, 3), np.uint8)
    green[..., 1] = 255
    cv2.imwrite(str(bg_dir / "photo.jpg"), green)

    bank = load_asset_bank(str(tex_dir), str(bg_dir), bg_hw=(96, 128))
    assert bank.textures.shape[0] == 1
    assert bank.backgrounds.shape[0] == 1

    s = synthetic_batch(jax.random.key(0), 4, 96, 128, 0.0, bank, 1.0)
    img = np.asarray(s.image)
    mask = np.asarray(s.mask).astype(bool)
    for i in range(4):
        inside = img[i][mask[i]]
        outside = img[i][~mask[i]]
        assert inside.shape[0] > 50
        # red-dominant card, green-dominant background (lighting scales all
        # channels equally so channel dominance survives)
        assert inside[:, 0].mean() > 3 * (inside[:, 1].mean() + 1e-3)
        assert outside[:, 1].mean() > 3 * (outside[:, 0].mean() + 1e-3)

    # real_prob=0 must reproduce the fully procedural render
    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch as sb
    a = sb(jax.random.key(1), 2, 96, 128, 0.0, bank, 0.0)
    b = sb(jax.random.key(1), 2, 96, 128, 0.0)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=1e-6)


def test_canonicalize_corners_image_space():
    """Corner labels are image-space clockwise-from-top-left regardless of
    card orientation (preprocess_masks.py:196-223 contract) — an upside-down
    card must get the same labeling a mask-derived annotation would."""
    from mtg_card_image_segmentation_tpu.data.corners import order_corners
    from mtg_card_image_segmentation_tpu.data.synthetic import canonicalize_corners

    rng = np.random.default_rng(0)
    fn = jax.jit(canonicalize_corners)
    for _ in range(50):
        # random gently-perspective card quad at a random orientation
        ang = rng.uniform(0, 2 * np.pi)
        w_, h_ = rng.uniform(40, 80), rng.uniform(60, 110)
        base = np.array(
            [[-w_ / 2, -h_ / 2], [w_ / 2, -h_ / 2], [w_ / 2, h_ / 2], [-w_ / 2, h_ / 2]]
        )
        rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        quad = base @ rot.T + rng.uniform(100, 150, 2) + rng.uniform(-4, 4, (4, 2))
        perm = rng.permutation(4)
        got = np.asarray(fn(jnp.asarray(quad[perm], jnp.float32)))
        want = order_corners(quad)
        np.testing.assert_allclose(got, want, atol=1e-3)
        # invariants that always hold: starts at min(x+y), clockwise winding
        assert np.argmin(got.sum(axis=1)) == 0
        x, y = got[:, 0], got[:, 1]
        shoelace = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert shoelace > 0  # y-down coords: positive = clockwise on screen


def test_augmented_corners_canonical(mesh8):
    """After the fused render+augment path (flips included) the corner order
    is still image-space canonical."""
    from mtg_card_image_segmentation_tpu.data.synthetic import (
        synthetic_augmented_batch,
    )

    cfg = AugmentConfig(enabled=True, hflip_prob=1.0)
    s = synthetic_augmented_batch(
        jax.random.key(5), 8, 160, 120, 0.0, cfg, with_displacement=False
    )
    corners = np.asarray(s.corners)
    for i in range(8):
        if not bool(s.has_card[i]):
            continue
        got = corners[i]
        assert np.argmin(got.sum(axis=1)) == 0
        x, y = got[:, 0], got[:, 1]
        assert np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) > 0


def test_keep_in_frame_corners_visible():
    """Keypoint-pipeline contract: every GT corner inside the image (the
    reference's annotations are mask-derived from fully-in-view renders, so
    off-screen corners never occur; heatmap argmax cannot represent them)."""
    from mtg_card_image_segmentation_tpu.data.synthetic import (
        synthetic_augmented_batch,
        synthetic_batch,
    )

    h, w = 120, 160
    s = synthetic_batch(jax.random.key(7), 32, h, w, 0.0, keep_in_frame=True)
    c = np.asarray(s.corners)
    assert (c[..., 0] >= 0).all() and (c[..., 0] <= w - 1).all()
    assert (c[..., 1] >= 0).all() and (c[..., 1] <= h - 1).all()
    # clean render path still yields valid card masks
    assert np.asarray(s.mask).sum() > 0


def test_hdri_lighting_and_background(tmp_path):
    """HDRI maps light the render (strength 0.8-1.5, random rotation — the
    reference's world lighting, generate_synthetic.py:326-361) and join the
    background pool. Two banks with different HDRIs must produce different
    renders; the same bank+key must be deterministic."""
    import cv2

    from mtg_card_image_segmentation_tpu.data.synthetic import (
        load_asset_bank,
        synthetic_batch,
    )

    def make_bank(d, color):
        d.mkdir()
        hdr = np.zeros((32, 64, 3), np.float32)
        hdr[..., color] = 3.0  # radiance > 1: exercises Reinhard tone-map
        hdr[:, :32, :] *= 0.2  # horizontal structure so rotation matters
        cv2.imwrite(str(d / "env.hdr"), hdr)
        return load_asset_bank(None, None, hdri_dir=str(d))

    bank_a = make_bank(tmp_path / "ha", 2)
    bank_b = make_bank(tmp_path / "hb", 0)
    assert bank_a.hdris.shape[0] == 1 and bank_a.hdri_light.shape[0] == 1
    # tone-mapped to [0,1]; light field mean-normalized to ~1
    assert float(bank_a.hdris.max()) <= 1.0
    np.testing.assert_allclose(float(bank_a.hdri_light.mean()), 1.0, atol=1e-3)

    key = jax.random.key(7)
    sa = synthetic_batch(key, 2, 64, 64, 0.0, bank_a, 1.0)
    sb_ = synthetic_batch(key, 2, 64, 64, 0.0, bank_b, 1.0)
    s0 = synthetic_batch(key, 2, 64, 64, 0.0)
    # HDRI content reaches the pixels: different environments -> different
    # renders, and both differ from the procedural-only render
    assert float(np.abs(np.asarray(sa.image) - np.asarray(sb_.image)).max()) > 0.01
    assert float(np.abs(np.asarray(sa.image) - np.asarray(s0.image)).max()) > 0.01
    # deterministic under the same bank + key
    sa2 = synthetic_batch(key, 2, 64, 64, 0.0, bank_a, 1.0)
    np.testing.assert_array_equal(np.asarray(sa.image), np.asarray(sa2.image))
