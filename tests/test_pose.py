"""Pose pipeline: heatmap ops, HRNet model, train/eval steps, pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.ops import heatmap as hm


def test_gaussian_heatmap_matches_reference_formula():
    centers = jnp.asarray([[5.0, 3.0], [0.0, 0.0], [-1.0, -1.0], [10.0, 7.0]])
    out = np.asarray(hm.gaussian_heatmaps(centers, 8, 12, sigma=2.0))
    assert out.shape == (8, 12, 4)
    # reference formula (model.py:167-192)
    xx, yy = np.meshgrid(np.arange(12, dtype=np.float32), np.arange(8, dtype=np.float32))
    ref = np.exp(-((xx - 5.0) ** 2 + (yy - 3.0) ** 2) / (2 * 4.0))
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-5, atol=1e-6)
    # missing keypoint renders zeros
    assert out[..., 2].max() == 0.0
    # peak at the center
    assert out[3, 5, 0] == out[..., 0].max()


def test_decode_argmax_roundtrip():
    centers = jnp.asarray([[[5.0, 3.0], [11.0, 7.0], [0.0, 0.0], [2.0, 6.0]]])
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 8, 12, 1.5))(centers)
    coords, vals = hm.decode_argmax(targets)
    px = np.asarray(hm.coords01_to_pixels(coords, (8, 12)))
    np.testing.assert_allclose(px[0], np.asarray(centers)[0], atol=1e-5)
    assert np.all(np.asarray(vals) > 0.99)


def test_decode_argmax_subpixel_quadratic():
    """Quadratic peak refinement recovers fractional Gaussian centers to
    ~0.1 hm-px (integer argmax floors at ~0.5), including near borders."""
    centers = jnp.asarray(
        [[[5.3, 3.7], [10.2, 6.1], [20.6, 15.4], [47.0, 31.0]]]
    )
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 32, 48, 2.0))(centers)
    coords, vals = hm.decode_argmax_subpixel(targets)
    px = np.asarray(hm.coords01_to_pixels(coords, (32, 48)))
    np.testing.assert_allclose(px[0], np.asarray(centers)[0], atol=0.15)
    assert np.all(np.asarray(vals) > 0.9)
    # a peak ON the border keeps the integer decode (no spurious ±0.5)
    border = jnp.asarray([[[0.0, 0.0], [47.0, 0.0], [0.0, 31.0], [47.0, 31.0]]])
    btargets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 32, 48, 2.0))(border)
    bcoords, _ = hm.decode_argmax_subpixel(btargets)
    bpx = np.asarray(hm.coords01_to_pixels(bcoords, (32, 48)))
    np.testing.assert_allclose(bpx[0], np.asarray(border)[0], atol=1e-5)
    # strictly better than the integer decode on fractional centers
    coords_int, _ = hm.decode_argmax(targets)
    px_int = np.asarray(hm.coords01_to_pixels(coords_int, (32, 48)))
    err_sub = np.abs(px[0, :2] - np.asarray(centers)[0, :2]).max()
    err_int = np.abs(px_int[0, :2] - np.asarray(centers)[0, :2]).max()
    assert err_sub < err_int


def test_decode_joint_nms_matches_subpixel_on_clean_heatmaps():
    """With one clean Gaussian per channel the joint decode must equal the
    plain sub-pixel decode (the joint machinery is the identity when
    channels don't conflict)."""
    centers = jnp.asarray([[[5.3, 3.7], [40.2, 6.1], [41.6, 25.4], [6.0, 24.0]]])
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 32, 48, 2.0))(centers)
    cj, vj = hm.decode_joint_nms(targets)
    cs, vs = hm.decode_argmax_subpixel(targets)
    np.testing.assert_allclose(np.asarray(cj), np.asarray(cs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vj), np.asarray(vs), atol=1e-5)


def test_decode_joint_nms_identity_confusion_regression():
    """Observed in the 384-image HRNet eval: one corner channel peaked ON
    another corner's location (430 px miss with three perfect corners).
    The joint decode must place that channel at its secondary true peak
    and the canonical reorder must keep the TL,TR,BR,BL identity."""
    true = np.array([[6.0, 4.0], [40.0, 6.0], [42.0, 26.0], [7.0, 25.0]],
                    np.float32)
    hms = []
    for ch in range(4):
        g = np.asarray(hm.gaussian_heatmaps(
            jnp.asarray(true[ch:ch + 1]), 32, 48, 1.5))[..., 0]
        hms.append(g)
    # channel 0 (TL): dominant FALSE peak at BL's location, true peak weaker
    false_peak = np.asarray(hm.gaussian_heatmaps(
        jnp.asarray(true[3:4]), 32, 48, 1.5))[..., 0]
    hms[0] = 0.6 * hms[0] + 0.9 * false_peak
    heat = jnp.asarray(np.stack(hms, axis=-1))[None]  # (1, 32, 48, 4)

    cj, _ = hm.decode_joint_nms(heat)
    px = np.asarray(hm.coords01_to_pixels(cj, (32, 48)))[0]
    np.testing.assert_allclose(px, true, atol=0.5)
    # the naive independent decode DOES fail here (guards test validity)
    ci, _ = hm.decode_argmax_subpixel(heat)
    pxi = np.asarray(hm.coords01_to_pixels(ci, (32, 48)))[0]
    assert np.abs(pxi[0] - true[0]).max() > 10.0


def test_decode_soft_argmax_subpixel():
    centers = jnp.asarray([[[5.3, 3.7], [10.2, 6.1], [1.5, 1.5], [8.8, 2.2]]])
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 32, 48, 2.0))(centers)
    coords, _ = hm.decode_soft_argmax(targets * 20.0)  # sharpen
    px = np.asarray(hm.coords01_to_pixels(coords, (32, 48)))
    np.testing.assert_allclose(px[0], np.asarray(centers)[0], atol=0.3)
    # integer argmax can't do better than 0.5px here
    coords_int, _ = hm.decode_argmax(targets)
    px_int = np.asarray(hm.coords01_to_pixels(coords_int, (32, 48)))
    err_soft = np.abs(px[0] - np.asarray(centers)[0]).max()
    err_int = np.abs(px_int[0] - np.asarray(centers)[0]).max()
    assert err_soft < err_int


def test_pixels_to_heatmap_coords():
    pts = jnp.asarray([[639.0, 479.0], [0.0, 0.0], [-1.0, -1.0]])
    out = np.asarray(hm.pixels_to_heatmap_coords(pts, (480, 640), (120, 160)))
    np.testing.assert_allclose(out[0], [159.0, 119.0], rtol=1e-5)
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    assert (out[2] == -1.0).all()


def test_extract_peaks_threshold():
    centers = jnp.asarray([[[5.0, 3.0], [-1.0, -1.0], [2.0, 2.0], [7.0, 7.0]]])
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 16, 16, 1.0))(centers)
    coords, conf, valid = hm.extract_peaks(targets, threshold=0.5)
    v = np.asarray(valid[0])
    assert v.tolist() == [True, False, True, True]


@pytest.fixture(scope="module")
def pose_model_vars():
    model = create_model(
        "hrnet_pose", compute_dtype="float32", heatmap_height=30, heatmap_width=40
    )
    x = jnp.zeros((1, 120, 160, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_hrnet_pose_shapes(pose_model_vars):
    model, variables = pose_model_vars
    x = jnp.zeros((2, 120, 160, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 30, 40, 4)
    assert out.dtype == jnp.float32


def test_hrnet_backbone_strides():
    from mtg_card_image_segmentation_tpu.models.hrnet import HRNetBackbone

    model = HRNetBackbone(dtype=jnp.float32)
    x = jnp.zeros((1, 128, 96, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    feats = model.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 32, 24, 16), (1, 16, 12, 32), (1, 8, 6, 64), (1, 4, 3, 128)
    ]


def test_hrnet_param_count(pose_model_vars):
    from mtg_card_image_segmentation_tpu.utils import count_parameters

    _, variables = pose_model_vars
    total = count_parameters(variables["params"])
    # HRNet-w18-small backbone + 256-wide deconv head: small, single-digit M
    assert 1e6 < total < 10e6


@pytest.mark.slow
def test_pose_train_step_learns(mesh8):
    from mtg_card_image_segmentation_tpu.training import create_seg_state
    from mtg_card_image_segmentation_tpu.training.loop import (
        make_pose_eval_step,
        make_pose_train_step,
    )
    import optax

    model = create_model(
        "hrnet_pose", compute_dtype="float32", heatmap_height=16, heatmap_width=16
    )
    tx = optax.adamw(1e-3)
    state = create_seg_state(model, tx, (1, 64, 64, 3), jax.random.key(0))

    # toy: corner positions correlate with image content
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    centers = jnp.asarray(
        np.tile(np.array([[[3, 3], [12, 3], [12, 12], [3, 12]]], np.float32), (8, 1, 1))
    )
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 16, 16, 2.0))(centers)

    from mtg_card_image_segmentation_tpu.parallel import shard_batch

    images_d = shard_batch(mesh8, images)
    targets_d = jax.device_put(targets, images_d.sharding)

    step = make_pose_train_step(mesh=mesh8)
    losses = []
    for _ in range(30):
        state, stats = step(state, images_d, targets_d)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]

    eval_step = make_pose_eval_step((64, 64), mesh=mesh8)
    stats, distances = eval_step(state, images_d, targets_d)
    assert distances.shape == (8, 4)


def test_pose_pipeline_targets_match_corners(mesh8):
    from mtg_card_image_segmentation_tpu.data.pipeline import PoseSyntheticPipeline

    pipe = PoseSyntheticPipeline(4, 96, 128, 24, 32, mesh=mesh8, seed=0)
    images, targets, corners = next(iter(pipe))
    assert images.shape == (4, 96, 128, 3)
    assert targets.shape == (4, 24, 32, 4)
    # decode targets back to image pixels, compare with emitted corners
    coords01, vals = hm.decode_argmax(targets)
    px = np.asarray(hm.coords01_to_pixels(coords01, (96, 128)))
    c = np.asarray(corners)
    in_frame = (
        (c[..., 0] >= 0) & (c[..., 0] <= 127) & (c[..., 1] >= 0) & (c[..., 1] <= 95)
    )
    # heatmap cells are 4px; decode error should be within half a cell + slack
    err = np.abs(px - c)
    assert err[in_frame].max() < 4.0, err[in_frame].max()


def test_augment_flip_reorders_corners():
    from mtg_card_image_segmentation_tpu.config import AugmentConfig
    from mtg_card_image_segmentation_tpu.data.augment import augment_sample

    img = np.zeros((32, 32, 3), np.float32)
    mask = np.zeros((32, 32), np.int32)
    kpts = jnp.asarray([[4.0, 4.0], [27.0, 4.0], [27.0, 27.0], [4.0, 27.0]])
    cfg = AugmentConfig(
        hflip_prob=1.0, affine_prob=0.0, elastic_prob=0.0, grid_distort_prob=0.0,
        color_jitter_prob=0.0, brightness_contrast_prob=0.0, noise_blur_prob=0.0,
    )
    out = augment_sample(
        jax.random.key(0), jnp.asarray(img), jnp.asarray(mask), cfg,
        keypoints=kpts, flip_idx=(1, 0, 3, 2),
    )
    k = np.asarray(out.keypoints)
    # after flip + reorder, corner 0 is again top-left
    np.testing.assert_allclose(k[0], [4.0, 4.0], atol=1e-4)
    np.testing.assert_allclose(k[1], [27.0, 4.0], atol=1e-4)
    np.testing.assert_allclose(k[2], [27.0, 27.0], atol=1e-4)
    np.testing.assert_allclose(k[3], [4.0, 27.0], atol=1e-4)


def test_quad_plausible_cases():
    """Rotation-invariant sanity gate: ordered convex quads pass (any
    rotation); coincident corners, non-cyclic identity swaps, and
    degenerate areas fail."""
    good = np.array([[6.0, 4.0], [40.0, 6.0], [42.0, 26.0], [7.0, 25.0]],
                    np.float32)
    # rotate the good quad by 40 degrees about its centroid
    th = np.deg2rad(40.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                   np.float32)
    ctr = good.mean(0)
    rotated = (good - ctr) @ rot.T + ctr
    swapped = good[[2, 1, 0, 3]]  # TL<->BR identity swap: self-intersects
    coincident = good.copy()
    coincident[0] = good[3] + 0.5  # TL decoded onto BL
    tiny = np.stack([ctr + 0.1 * (g - ctr) for g in good])  # collapsed area
    quads = jnp.asarray(np.stack([good, rotated, swapped, coincident, tiny]))
    ok = np.asarray(hm.quad_plausible(quads))
    assert ok.tolist() == [True, True, False, False, False]


def test_gated_decode_identical_on_clean_heatmaps():
    """When the independent decode is plausible the gated decode must be
    bit-identical to it — the gate must not perturb the 0.95 px mean."""
    centers = jnp.asarray([[[5.3, 3.7], [40.2, 6.1], [41.6, 25.4], [6.0, 24.0]],
                           [[10.0, 8.0], [35.0, 9.0], [36.0, 22.0], [11.0, 21.0]]])
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 32, 48, 2.0))(centers)
    cg, vg = hm.decode_argmax_subpixel_gated(targets)
    cs, vs = hm.decode_argmax_subpixel(targets)
    np.testing.assert_array_equal(np.asarray(cg), np.asarray(cs))
    np.testing.assert_array_equal(np.asarray(vg), np.asarray(vs))


def test_gated_decode_completes_dead_channel():
    """The real HRNet eval tail (round 3/4): one corner channel produces
    essentially NO activation anywhere (global max ~0.002) while the other
    three are confident. The joint-NMS fallback measurably makes this
    worse (noise candidates poison the assignment); the gated decode must
    instead reconstruct the dead corner as the parallelogram completion of
    the three live ones, keep the live corners bit-identical to the
    independent decode, and keep the dead corner's honest confidence."""
    true = np.array([[6.0, 4.0], [40.0, 6.0], [42.0, 26.0], [7.0, 25.0]],
                    np.float32)
    heat = np.array(jax.vmap(
        lambda c: hm.gaussian_heatmaps(c, 32, 48, 1.5)
    )(jnp.asarray(true)[None]))[0]
    rng = np.random.default_rng(0)
    heat[..., 0] = 0.002 * rng.random((32, 48)).astype(np.float32)  # dead TL
    heat = jnp.asarray(heat[None])

    cg, vg = hm.decode_argmax_subpixel_gated(heat)
    px = np.asarray(hm.coords01_to_pixels(cg, (32, 48)))
    # live corners: bit-identical to the independent decode
    ci, vi = hm.decode_argmax_subpixel(heat)
    pxi = np.asarray(hm.coords01_to_pixels(ci, (32, 48)))
    np.testing.assert_array_equal(px[0, 1:], pxi[0, 1:])
    # dead corner: parallelogram completion of the three live PREDICTIONS
    expect = pxi[0, 1] + pxi[0, 3] - pxi[0, 2]
    np.testing.assert_allclose(px[0, 0], expect, atol=1e-4)
    assert np.abs(px[0, 0] - true[0]).max() < 2.0  # and near the truth
    # honest confidence: the dead channel's score is NOT rewritten
    assert float(np.asarray(vg)[0, 0]) < 0.01
    # two dead channels: completion must not fire (underdetermined)
    heat2 = np.asarray(heat)[0].copy()
    heat2[..., 1] = 0.002 * rng.random((32, 48)).astype(np.float32)
    c2, _ = hm.decode_argmax_subpixel_gated(jnp.asarray(heat2[None]))
    # with two dead channels the quad gate may route to the joint decode;
    # the completion itself must not have produced the parallelogram point
    px2 = np.asarray(hm.coords01_to_pixels(c2, (32, 48)))
    assert not np.allclose(px2[0, 0], expect, atol=1e-4) or not np.allclose(
        px2[0, 1], pxi[0, 1], atol=1e-4)


def test_complete_dead_corner_scaling_invariance():
    """Completion commutes with per-axis scaling (it is linear), so gating
    in normalized coords equals gating in pixels."""
    coords = jnp.asarray(np.random.default_rng(1).random((3, 4, 2)), jnp.float32)
    conf = jnp.asarray([[0.05, 0.9, 0.8, 0.95],
                        [0.9, 0.9, 0.9, 0.9],
                        [0.05, 0.9, 0.3, 0.95]], jnp.float32)
    out, fired = hm.complete_dead_corner(coords, conf)
    scale = jnp.asarray([639.0, 479.0])
    out_px, fired_px = hm.complete_dead_corner(coords * scale, conf)
    np.testing.assert_allclose(
        np.asarray(out) * np.asarray(scale), np.asarray(out_px), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(fired), np.asarray(fired_px))
    # row 0 fires on exactly corner 0; row 1 nothing dead; row 2 has a
    # sub-live companion (0.3) so the gate must hold fire
    assert np.asarray(fired).tolist() == [
        [True, False, False, False],
        [False, False, False, False],
        [False, False, False, False],
    ]


def test_gated_decode_repairs_identity_confusion():
    """The observed HRNet tail failure (one corner channel dominated by
    another corner's location) must route through the joint fallback and
    land near the true corners, while an adjacent clean image in the same
    batch keeps its exact independent decode."""
    true = np.array([[6.0, 4.0], [40.0, 6.0], [42.0, 26.0], [7.0, 25.0]],
                    np.float32)
    hms = []
    for ch in range(4):
        g = np.asarray(hm.gaussian_heatmaps(
            jnp.asarray(true[ch:ch + 1]), 32, 48, 1.5))[..., 0]
        hms.append(g)
    false_peak = np.asarray(hm.gaussian_heatmaps(
        jnp.asarray(true[3:4]), 32, 48, 1.5))[..., 0]
    hms[0] = 0.6 * hms[0] + 0.9 * false_peak  # TL channel peaks on BL
    broken = np.stack(hms, axis=-1)
    clean = np.asarray(jax.vmap(
        lambda c: hm.gaussian_heatmaps(c, 32, 48, 1.5)
    )(jnp.asarray(true)[None]))[0]
    heat = jnp.asarray(np.stack([broken, clean]))  # (2, 32, 48, 4)

    cg, _ = hm.decode_argmax_subpixel_gated(heat)
    px = np.asarray(hm.coords01_to_pixels(cg, (32, 48)))
    np.testing.assert_allclose(px[0], true, atol=0.5)  # repaired
    ci, _ = hm.decode_argmax_subpixel(heat)
    pxi = np.asarray(hm.coords01_to_pixels(ci, (32, 48)))
    assert np.abs(pxi[0, 0] - true[0]).max() > 10.0  # guard: it WAS broken
    np.testing.assert_array_equal(px[1], pxi[1])  # clean image untouched
