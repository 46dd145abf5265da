"""Evaluation subsystem: seg evaluator report + pose evaluator report."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.evaluation import PoseEvaluator, SegEvaluator


class _PerfectSegModel:
    """apply(variables, images, train) that segments red-dominant pixels —
    used with masks built the same way, so metrics must be ~perfect."""

    def apply(self, variables, images, train=False):
        score = images[..., 0] - 0.5
        return jnp.stack([-score, score], axis=-1) * 10.0


def test_seg_evaluator_report(tmp_path):
    model = _PerfectSegModel()
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    masks = (images[..., 0] > 0.5).astype(np.int32)
    ev = SegEvaluator(model.apply, {}, 2)
    report = ev.evaluate(
        [(jnp.asarray(images), jnp.asarray(masks))],
        output_dir=str(tmp_path),
        save_plots=True,
    )
    assert report["metrics"]["pixel_accuracy"] > 0.999
    assert report["metrics"]["iou_card"] > 0.999
    assert report["targets"]["iou_card>0.85"]
    assert report["per_image_iou"]["below_threshold"] == 0
    assert (tmp_path / "evaluation_report.json").is_file()
    assert (tmp_path / "confusion_matrix.png").stat().st_size > 1000
    assert (tmp_path / "prediction_analysis.png").stat().st_size > 1000


def test_seg_evaluator_failure_mining():
    class BadModel:
        def apply(self, variables, images, train=False):
            # always predicts background
            b = jnp.ones(images.shape[:-1])
            return jnp.stack([b, -b], axis=-1)

    rng = np.random.default_rng(1)
    images = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    masks = np.ones((4, 8, 8), np.int32)
    ev = SegEvaluator(BadModel().apply, {}, 2)
    report = ev.evaluate([(jnp.asarray(images), jnp.asarray(masks))])
    assert report["per_image_iou"]["below_threshold"] == 4
    assert len(report["failures"]) == 4
    assert not report["targets"]["iou_card>0.85"]


def test_seg_evaluator_failure_panels(tmp_path):
    """Mined failures are saved as viewable image/GT/pred/confidence panels
    (train/evaluate.py:240-295 failure-case images)."""

    class BadModel:
        def apply(self, variables, images, train=False):
            b = jnp.ones(images.shape[:-1])
            return jnp.stack([b, -b], axis=-1)

    rng = np.random.default_rng(2)
    images = rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32)
    masks = np.ones((3, 8, 8), np.int32)
    ev = SegEvaluator(BadModel().apply, {}, 2)
    report = ev.evaluate(
        [(jnp.asarray(images), jnp.asarray(masks))], output_dir=str(tmp_path)
    )
    assert len(report["failures"]) == 3
    for f in report["failures"]:
        panel = tmp_path / f["panel"]
        assert panel.is_file() and panel.stat().st_size > 1000
        assert "failures/" in f["panel"]
    # the written report carries the panel paths too
    data = json.loads((tmp_path / "evaluation_report.json").read_text())
    assert all("panel" in f for f in data["failures"])


def test_seg_evaluator_worst_case_panels(tmp_path):
    """Even a model with zero below-threshold failures writes worst-k
    panels — the QA loop always has a worst tail to look at."""
    model = _PerfectSegModel()
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (12, 16, 16, 3)).astype(np.float32)
    masks = (images[..., 0] > 0.5).astype(np.int32)
    batches = [
        (jnp.asarray(images[:6]), jnp.asarray(masks[:6])),
        (jnp.asarray(images[6:]), jnp.asarray(masks[6:])),
    ]
    ev = SegEvaluator(model.apply, {}, 2)
    report = ev.evaluate(batches, output_dir=str(tmp_path), worst_k=3)
    assert report["failures"] == []
    assert len(report["worst_cases"]) == 3
    # sorted ascending by IoU, global indices within range
    ious = [w["iou"] for w in report["worst_cases"]]
    assert ious == sorted(ious)
    assert all(0 <= w["index"] < 12 for w in report["worst_cases"])
    for w in report["worst_cases"]:
        panel = tmp_path / w["panel"]
        assert panel.is_file() and panel.stat().st_size > 1000
        assert "failures/" in w["panel"]


def test_merge_worst_k_multi_displacement():
    """A full buffer must accept EVERY qualifying candidate from one batch,
    not just the first (regression: the cutoff was compared against the
    just-appended entry, dropping later candidates that still beat weaker
    buffer members). Entries are built lazily, only on admission."""
    from mtg_card_image_segmentation_tpu.evaluation.worstk import merge_worst_k

    built = []

    def entry(tag):
        return lambda: (built.append(tag) or tag,)

    # seg-style (smaller IoU = more extreme)
    buf = [(0.2, "a"), (0.3, "b"), (0.5, "c")]
    merge_worst_k(
        buf, [(0.1, entry("d")), (0.25, entry("e")), (0.45, entry("f"))],
        3, reverse=False,
    )
    assert [k for k, *_ in buf] == [0.1, 0.2, 0.25]
    assert built == ["d", "e"]  # 0.45 rejected without building

    # pose-style (larger error = more extreme)
    buf2 = [(10.0, "a"), (9.0, "b"), (8.0, "c")]
    merge_worst_k(
        buf2, [(12.0, entry("x")), (9.5, entry("y")), (7.0, entry("z"))],
        3, reverse=True,
    )
    assert [k for k, *_ in buf2] == [12.0, 10.0, 9.5]
    assert built == ["d", "e", "x", "y"]


def test_pose_evaluator_worst_case_panels(tmp_path):
    from mtg_card_image_segmentation_tpu.ops import heatmap as hm

    corners = np.array(
        [[[10.0, 10.0], [50.0, 10.0], [50.0, 40.0], [10.0, 40.0]]], np.float32
    ).repeat(6, axis=0)

    class OracleModel:
        def apply(self, variables, images, train=False):
            shifted = jnp.asarray(corners[:4]) + jnp.asarray([2.0, 0.0])
            hm_coords = hm.pixels_to_heatmap_coords(shifted, (48, 64), (24, 32))
            return hm.gaussian_heatmaps_batch(hm_coords, 24, 32, 1.5)[
                : images.shape[0]
            ]

    ev = PoseEvaluator(OracleModel().apply, {}, image_hw=(48, 64))
    batches = [
        (jnp.zeros((4, 48, 64, 3)), None, jnp.asarray(corners[:4])),
        (jnp.zeros((2, 48, 64, 3)), None, jnp.asarray(corners[4:])),
    ]
    report = ev.evaluate(batches, output_dir=str(tmp_path), worst_k=3)
    assert len(report["worst_cases"]) == 3
    errs = [w["max_error_px"] for w in report["worst_cases"]]
    assert errs == sorted(errs, reverse=True)
    assert all(0 <= w["index"] < 6 for w in report["worst_cases"])
    for w in report["worst_cases"]:
        panel = tmp_path / w["panel"]
        assert panel.is_file() and panel.stat().st_size > 1000
        assert "failures/" in w["panel"]
    data = json.loads((tmp_path / "pose_evaluation.json").read_text())
    assert all("panel" in w for w in data["worst_cases"])


def test_pose_evaluator_report(tmp_path):
    from mtg_card_image_segmentation_tpu.ops import heatmap as hm

    corners = np.array(
        [[[10.0, 10.0], [50.0, 10.0], [50.0, 40.0], [10.0, 40.0]]], np.float32
    ).repeat(4, axis=0)

    class OracleModel:
        """Predict heatmaps whose argmax is 2px off the truth in x."""

        def apply(self, variables, images, train=False):
            shifted = jnp.asarray(corners) + jnp.asarray([2.0, 0.0])
            hm_coords = hm.pixels_to_heatmap_coords(shifted, (48, 64), (24, 32))
            return hm.gaussian_heatmaps_batch(hm_coords, 24, 32, 1.5)

    ev = PoseEvaluator(OracleModel().apply, {}, image_hw=(48, 64))
    batches = [(jnp.zeros((4, 48, 64, 3)), None, jnp.asarray(corners))]
    report = ev.evaluate(batches, output_dir=str(tmp_path))
    # 2px x-shift (+ sub-heatmap-pixel rounding, 2px/cell) -> errors ~2-3px
    assert report["mean_error_px"] < 4.0
    assert report["accuracy_5px"] == 100.0
    assert report["accuracy_3px"] >= 50.0
    assert report["detection_rate"] == 1.0
    assert set(report["per_corner"]) == {
        "top_left", "top_right", "bottom_right", "bottom_left"
    }
    assert (tmp_path / "pose_evaluation.json").is_file()
    assert (tmp_path / "report.txt").stat().st_size > 100
    assert (tmp_path / "error_distribution.png").stat().st_size > 1000
    assert (tmp_path / "accuracy_curve.png").stat().st_size > 1000
    data = json.loads((tmp_path / "pose_evaluation.json").read_text())
    assert data["tiers"]["acc10_target>90"]


def test_corner_evaluator_yolo_decode(tmp_path):
    """CornerEvaluator consumes the YOLO decode path (top1_detection over
    decoded boxes/scores/kpts) and emits the same report schema
    (evaluate_model.py:74-326)."""
    from mtg_card_image_segmentation_tpu.evaluation import CornerEvaluator

    corners = np.array(
        [[[10.0, 10.0], [50.0, 10.0], [50.0, 40.0], [10.0, 40.0]]], np.float32
    ).repeat(4, axis=0)

    class OracleYolo:
        """Two candidate anchors: a low-conf decoy far away and a high-conf
        detection whose keypoints are 1px off the truth in y."""

        def apply(self, variables, images, train=False):
            b = images.shape[0]
            boxes = jnp.zeros((b, 2, 4))
            scores = jnp.asarray(
                np.tile(np.array([[[0.1], [0.9]]], np.float32), (b, 1, 1))
            )
            truth = corners[0] + np.array([0.0, 1.0], np.float32)  # (4, 2)
            kpts = np.zeros((b, 2, 4, 3), np.float32)
            kpts[:, 1, :, :2] = truth
            kpts[:, 1, :, 2] = 1.0
            return boxes, scores, jnp.asarray(kpts)

    ev = CornerEvaluator(OracleYolo().apply, {}, image_hw=(48, 64))
    batches = [(jnp.zeros((4, 48, 64, 3)), jnp.asarray(corners))]
    report = ev.evaluate(batches, output_dir=str(tmp_path))
    # top-1 must pick the 0.9-conf anchor -> 1px error everywhere
    np.testing.assert_allclose(report["mean_error_px"], 1.0, atol=1e-5)
    assert report["accuracy_3px"] == 100.0
    assert report["detection_rate"] == 1.0
    assert (tmp_path / "pose_evaluation.json").is_file()


def test_evaluators_clear_stale_failure_panels(tmp_path):
    """Re-evaluating into the same run dir must leave ONLY the files the
    current run wrote — stale worst-k panels from a previous decode were
    observed accreting next to regenerated ones (VERDICT r3 weak #3)."""

    class BadModel:
        def apply(self, variables, images, train=False):
            b = jnp.ones(images.shape[:-1])
            return jnp.stack([b, -b], axis=-1)

    rng = np.random.default_rng(7)
    images = rng.uniform(0, 1, (3, 8, 8, 3)).astype(np.float32)
    masks = np.ones((3, 8, 8), np.int32)
    stale = tmp_path / "failures" / "worst_00_err430.5px.png"
    stale.parent.mkdir(parents=True)
    stale.write_bytes(b"stale panel from a previous decode")

    ev = SegEvaluator(BadModel().apply, {}, 2)
    ev.evaluate(
        [(jnp.asarray(images), jnp.asarray(masks))], output_dir=str(tmp_path)
    )
    first = sorted(p.name for p in (tmp_path / "failures").iterdir())
    assert "worst_00_err430.5px.png" not in first
    # second run into the same dir: identical file set, no orphans
    ev.evaluate(
        [(jnp.asarray(images), jnp.asarray(masks))], output_dir=str(tmp_path)
    )
    second = sorted(p.name for p in (tmp_path / "failures").iterdir())
    assert second == first


def test_pose_evaluator_clears_stale_panels(tmp_path):
    """Same regeneration contract for the pose evaluator."""
    import mtg_card_image_segmentation_tpu.ops.heatmap as hm

    centers = jnp.asarray(
        [[[2.0, 2.0], [12.0, 2.5], [12.5, 9.0], [2.5, 9.5]]] * 2
    )
    targets = jax.vmap(lambda c: hm.gaussian_heatmaps(c, 12, 16, 1.5))(centers)

    def apply_fn(variables, images, train=False):
        return targets

    stale = tmp_path / "failures" / "worst_00_err430.5px.png"
    stale.parent.mkdir(parents=True)
    stale.write_bytes(b"stale")
    ev = PoseEvaluator(apply_fn, {}, (48, 64))
    px = np.asarray(hm.coords01_to_pixels(
        hm.decode_argmax_subpixel_gated(targets)[0], (48, 64)
    ))
    ev.evaluate(
        [(jnp.zeros((2, 48, 64, 3)), jnp.asarray(px))],
        output_dir=str(tmp_path), worst_k=2,
    )
    names = sorted(p.name for p in (tmp_path / "failures").iterdir())
    assert "worst_00_err430.5px.png" not in names
    assert all(n.startswith("worst_") for n in names)
