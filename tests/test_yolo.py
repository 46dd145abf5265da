"""YOLO12n-pose: architecture parity (param count vs ultralytics), decode
round-trip, loss + train step learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
    YOLO12Pose,
    decode_predictions,
    top1_detection,
)
from mtg_card_image_segmentation_tpu.training.yolo_loss import (
    corners_to_box,
    make_yolo_train_step,
    yolo_pose_loss,
)
from mtg_card_image_segmentation_tpu.utils import count_parameters


def test_param_count_matches_ultralytics():
    """yolo12n-pose.yaml:12 reports 2,886,715 params at nc=80, kpt (17,3);
    our graph matches to within the 16-param frozen DFL conv (which we
    compute as a constant expectation instead of a conv)."""
    m = YOLO12Pose(num_classes=80, num_keypoints=17, kpt_dim=3, dtype=jnp.float32)
    v = jax.jit(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=True))(
        jax.random.key(0)
    )
    n = count_parameters(v["params"])
    assert n == 2_886_715 - 16, n


@pytest.mark.slow
def test_decode_shapes_and_top1():
    m = create_model("yolo12n_pose", compute_dtype="float32")
    v = jax.jit(lambda k: m.init(k, jnp.zeros((1, 128, 128, 3)), train=True))(
        jax.random.key(0)
    )
    boxes, scores, kpts = m.apply(v, jnp.zeros((2, 128, 128, 3)), train=False)
    a = (128 // 8) ** 2 + (128 // 16) ** 2 + (128 // 32) ** 2
    assert boxes.shape == (2, a, 4)
    assert scores.shape == (2, a, 1)
    assert kpts.shape == (2, a, 4, 3)
    bb, conf, kk = top1_detection(boxes, scores, kpts)
    assert bb.shape == (2, 4) and kk.shape == (2, 4, 3)
    assert np.all(np.asarray(conf) >= 0) and np.all(np.asarray(conf) <= 1)


def test_corners_to_box_padding():
    corners = jnp.asarray([[[10.0, 20.0], [110.0, 20.0], [110.0, 220.0], [10.0, 220.0]]])
    box = np.asarray(corners_to_box(corners))
    np.testing.assert_allclose(box[0], [5.0, 10.0, 115.0, 230.0])


@pytest.mark.slow
def test_loss_finite_and_assigns():
    m = create_model("yolo12n_pose", compute_dtype="float32")
    v = jax.jit(lambda k: m.init(k, jnp.zeros((1, 128, 128, 3)), train=True))(
        jax.random.key(0)
    )
    outs, _ = m.apply(
        v, jnp.zeros((2, 128, 128, 3)), train=True, mutable=["batch_stats"]
    )
    corners = jnp.asarray(
        np.tile(np.array([[[30, 30], [90, 30], [90, 110], [30, 110]]], np.float32), (2, 1, 1))
    )
    loss, parts = yolo_pose_loss(outs, corners)
    assert np.isfinite(float(loss))
    for k in ("cls_loss", "box_loss", "dfl_loss", "kpt_loss", "kobj_loss"):
        assert np.isfinite(float(parts[k])), k


@pytest.mark.slow
def test_yolo_train_step_learns(mesh8):
    from mtg_card_image_segmentation_tpu.training import create_seg_state
    from mtg_card_image_segmentation_tpu.parallel import shard_batch

    m = create_model("yolo12n_pose", compute_dtype="float32")
    tx = optax.adamw(1e-3)
    state = create_seg_state(m, tx, (1, 64, 64, 3), jax.random.key(0))
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    corners = jnp.asarray(
        np.tile(np.array([[[16, 12], [48, 12], [48, 52], [16, 52]]], np.float32), (8, 1, 1))
    )
    images_d = shard_batch(mesh8, images)
    step = make_yolo_train_step(mesh=mesh8)
    losses = []
    for _ in range(20):
        state, parts = step(state, images_d, corners)
        losses.append(float(parts["loss"]))
    assert losses[-1] < losses[0], losses


def test_client_decode_matches_top1_detection():
    """The shipped numpy decode (export/yolo_client_decode.py, copied into
    every YOLO deployment package as decode_yolo.py) must agree with the
    in-repo joint decode that produces the reported accuracy."""
    from mtg_card_image_segmentation_tpu.export.yolo_client_decode import decode

    rng = np.random.default_rng(7)
    a, k = 336, 4
    for trial in range(8):
        boxes = jnp.asarray(rng.uniform(0, 128, (1, a, 4)), jnp.float32)
        scores = jnp.asarray(rng.uniform(0, 1, (1, a, 1)), jnp.float32)
        kpts = jnp.asarray(
            np.concatenate(
                [rng.uniform(0, 128, (1, a, k, 2)), rng.uniform(0, 1, (1, a, k, 1))],
                axis=-1,
            ),
            jnp.float32,
        )
        bb, conf, kk = top1_detection(boxes, scores, kpts)

        # assemble the ONNX output0 layout: (1, 4+nc+3K, A)
        out0 = np.concatenate(
            [
                np.asarray(boxes)[0].T,
                np.asarray(scores)[0].T,
                np.transpose(np.asarray(kpts)[0], (1, 2, 0)).reshape(3 * k, a),
            ],
            axis=0,
        )[None]
        box_np, score_np, kp_np = decode(out0, num_keypoints=k)
        np.testing.assert_allclose(box_np, np.asarray(bb)[0], rtol=1e-6)
        np.testing.assert_allclose(score_np, float(np.asarray(conf)[0]), rtol=1e-6)
        np.testing.assert_allclose(kp_np, np.asarray(kk)[0], rtol=1e-5, atol=1e-4)


def test_joint_decode_duplicate_peak_regression():
    """Observed on a real export probe: one corner channel's two highest
    raw anchors were both adjacent anchors of ANOTHER corner's peak, and
    the true corner only ranked 3rd — a rank-based top-2 joint decode
    collapses two corners onto one point (219 px error). The greedy-NMS
    top-3 candidate selection must recover the true quadrilateral, in both
    the jitted decode and the shipped numpy client decode."""
    from mtg_card_image_segmentation_tpu.export.yolo_client_decode import decode

    a, k = 64, 4
    true = np.array([[10.0, 10.0], [100.0, 12.0], [98.0, 120.0], [12.0, 118.0]])
    kpts = np.zeros((1, a, k, 3), np.float32)
    kpts[..., :2] = 64.0  # far-field background anchors
    for ch in range(k):
        kpts[0, ch, ch, :] = (*true[ch], 0.6)  # true peak, anchor index=ch
    # corner channel 2: two anchors of corner 1's peak outrank the true one
    kpts[0, 40, 2] = (true[1][0] + 0.5, true[1][1] + 0.3, 0.8)
    kpts[0, 41, 2] = (true[1][0] - 0.4, true[1][1] + 0.6, 0.7)
    boxes = jnp.asarray(np.tile(np.array([5, 5, 105, 125], np.float32), (1, a, 1)))
    scores = jnp.asarray(np.full((1, a, 1), 0.9, np.float32))
    _, _, kk = top1_detection(boxes, scores, jnp.asarray(kpts))
    got = np.asarray(kk)[0, :, :2]
    # canonical order TL TR BR BL == `true`'s construction order
    np.testing.assert_allclose(got, true, atol=1.5)

    out0 = np.concatenate(
        [
            np.asarray(boxes)[0].T,
            np.asarray(scores)[0].T,
            np.transpose(kpts[0], (1, 2, 0)).reshape(3 * k, a),
        ],
        axis=0,
    )[None]
    got_np = np.asarray(decode(out0, num_keypoints=k)[2][:, :2])
    np.testing.assert_allclose(got_np, true, atol=1.5)
