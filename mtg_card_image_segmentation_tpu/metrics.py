"""Streaming segmentation + corner metrics.

Two flavors are provided:

1. Reference-compatible per-batch metrics (smooth=1e-6, averaged over batches)
   matching ``MetricsCalculator`` (train/utils.py:94-225) so numbers are
   directly comparable with the reference's training logs.
2. Exact streaming confusion-matrix metrics (``ConfusionAccumulator``) used by
   the evaluator (train/evaluate.py:88-137 computes per-class precision/
   recall/F1/IoU from a sklearn confusion matrix) — these are the honest
   dataset-level numbers and are what `bench`/eval report.

Everything is jit-friendly: per-batch stats are small fixed-shape arrays that
can live on device; accumulation is a pytree sum (psum-compatible).

Corner metrics mirror ``train-pose-estimation_custom/metrics.py:8-102``
(corner_acc_3px/6px, mean pixel distance) and the YOLO evaluator's
accuracy@{5,10,20}px (train-pose-estimation_yolo12n/evaluate_model.py:160-217).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_SMOOTH = 1e-6


# ---------------------------------------------------------------------------
# Per-batch (reference-compatible) segmentation metrics
# ---------------------------------------------------------------------------


def batch_iou(logits: jax.Array, targets: jax.Array, num_classes: int = 2) -> jax.Array:
    """Per-class smoothed IoU for one batch: (C,) array."""
    pred = jnp.argmax(logits, axis=-1)
    cls = jnp.arange(num_classes)
    pred_oh = (pred[..., None] == cls).astype(jnp.float32)
    tgt_oh = (targets[..., None] == cls).astype(jnp.float32)
    inter = jnp.sum(pred_oh * tgt_oh, axis=(0, 1, 2))
    union = jnp.sum(pred_oh, axis=(0, 1, 2)) + jnp.sum(tgt_oh, axis=(0, 1, 2)) - inter
    return (inter + _SMOOTH) / (union + _SMOOTH)


def batch_dice(logits: jax.Array, targets: jax.Array, num_classes: int = 2) -> jax.Array:
    """Per-class smoothed dice for one batch: (C,) array."""
    pred = jnp.argmax(logits, axis=-1)
    cls = jnp.arange(num_classes)
    pred_oh = (pred[..., None] == cls).astype(jnp.float32)
    tgt_oh = (targets[..., None] == cls).astype(jnp.float32)
    inter = jnp.sum(pred_oh * tgt_oh, axis=(0, 1, 2))
    denom = jnp.sum(pred_oh, axis=(0, 1, 2)) + jnp.sum(tgt_oh, axis=(0, 1, 2))
    return (2.0 * inter + _SMOOTH) / (denom + _SMOOTH)


def batch_pixel_accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == targets).astype(jnp.float32))


def segmentation_batch_stats(
    loss: jax.Array, logits: jax.Array, targets: jax.Array, num_classes: int = 2
) -> Dict[str, jax.Array]:
    """One batch's stats as a small pytree; sum these across batches then call
    :func:`summarize_batch_stats`."""
    return {
        "loss": loss.astype(jnp.float32),
        "iou": batch_iou(logits, targets, num_classes),
        "dice": batch_dice(logits, targets, num_classes),
        "pixel_accuracy": batch_pixel_accuracy(logits, targets),
        "count": jnp.asarray(1.0, jnp.float32),
    }


def summarize_batch_stats(acc: Dict[str, jax.Array]) -> Dict[str, float]:
    """Average accumulated batch stats into the reference's metric dict layout
    (train/utils.py:206-225)."""
    n = float(acc["count"])
    iou = np.asarray(acc["iou"]) / n
    dice = np.asarray(acc["dice"]) / n
    out = {
        "loss": float(acc["loss"]) / n,
        "mean_iou": float(iou.mean()),
        "mean_dice": float(dice.mean()),
        "pixel_accuracy": float(acc["pixel_accuracy"]) / n,
    }
    names = ["background", "card"] if iou.shape[0] == 2 else [str(i) for i in range(iou.shape[0])]
    for i, name in enumerate(names):
        out[f"iou_{name}"] = float(iou[i])
        out[f"dice_{name}"] = float(dice[i])
    return out


class MetricsAccumulator:
    """Host-side running accumulator over per-batch stat pytrees."""

    def __init__(self) -> None:
        self._acc: Dict[str, np.ndarray] | None = None

    def update(self, stats: Dict[str, jax.Array]) -> None:
        stats = jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), stats)
        if self._acc is None:
            self._acc = stats
        else:
            self._acc = jax.tree.map(np.add, self._acc, stats)

    def result(self) -> Dict[str, float]:
        if self._acc is None:
            return {}
        return summarize_batch_stats(self._acc)

    def reset(self) -> None:
        self._acc = None


# ---------------------------------------------------------------------------
# Exact streaming confusion-matrix metrics (evaluator)
# ---------------------------------------------------------------------------


def confusion_matrix(
    pred: jax.Array,
    targets: jax.Array,
    num_classes: int = 2,
    sample_weight: jax.Array | None = None,
) -> jax.Array:
    """Exact (C, C) confusion counts, rows = target, cols = pred. Static
    output shape, so it jits and psums cleanly.

    ``sample_weight``: optional per-image 0/1 weights of shape (B,) — padded
    batch rows (pipelines pad the last eval batch to a static shape) carry
    weight 0 so they contribute no counts.
    """
    idx = (targets.astype(jnp.int32) * num_classes + pred.astype(jnp.int32)).reshape(-1)
    if sample_weight is None:
        add = 1
    else:
        add = jnp.broadcast_to(
            sample_weight.astype(jnp.int32).reshape(
                (-1,) + (1,) * (targets.ndim - 1)
            ),
            targets.shape,
        ).reshape(-1)
    counts = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(add)
    return counts.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """Per-class precision/recall/F1/IoU + accuracy from a confusion matrix —
    the evaluator's formulas (train/evaluate.py:102-137)."""
    cm = np.asarray(cm, dtype=np.float64)
    num_classes = cm.shape[0]
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f1 = np.where(
            precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0
        )
        iou = np.where(tp + fp + fn > 0, tp / (tp + fp + fn), 0.0)
        dice = np.where(2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn), 0.0)
    out: Dict[str, float] = {
        "pixel_accuracy": float(tp.sum() / max(cm.sum(), 1.0)),
        "mean_iou": float(iou.mean()),
        "mean_dice": float(dice.mean()),
        "mean_f1": float(f1.mean()),
    }
    names = (
        ["background", "card"]
        if num_classes == 2
        else [str(i) for i in range(num_classes)]
    )
    for i, name in enumerate(names):
        out[f"precision_{name}"] = float(precision[i])
        out[f"recall_{name}"] = float(recall[i])
        out[f"f1_{name}"] = float(f1[i])
        out[f"iou_{name}"] = float(iou[i])
        out[f"dice_{name}"] = float(dice[i])
    return out


class ConfusionAccumulator:
    def __init__(self, num_classes: int = 2) -> None:
        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.int64)

    def update(self, cm_batch: jax.Array) -> None:
        self.cm += np.asarray(cm_batch, dtype=np.int64)

    def result(self) -> Dict[str, float]:
        return metrics_from_confusion(self.cm)

    def reset(self) -> None:
        self.cm[...] = 0


# ---------------------------------------------------------------------------
# Corner/keypoint metrics
# ---------------------------------------------------------------------------


def corner_distances(
    pred_xy: jax.Array, target_xy: jax.Array, image_size: tuple[int, int] | None = None
) -> jax.Array:
    """Per-corner Euclidean distances, (B, K).

    ``pred_xy``/``target_xy``: (B, K, 2) coordinates, normalized [0,1] if
    ``image_size`` (H, W) is given (then distances are scaled to pixels —
    matching CornerMetrics which scales normalized coords by image size,
    train-pose-estimation_custom/metrics.py:29-73), else already in pixels.
    """
    pred = pred_xy.astype(jnp.float32)
    tgt = target_xy.astype(jnp.float32)
    if image_size is not None:
        h, w = image_size
        scale = jnp.asarray([w, h], jnp.float32)
        pred = pred * scale
        tgt = tgt * scale
    return jnp.sqrt(jnp.sum((pred - tgt) ** 2, axis=-1) + 1e-12)


def corner_metrics(
    distances_px: jax.Array,
    thresholds: Sequence[float] = (3.0, 5.0, 6.0, 10.0, 20.0),
) -> Dict[str, jax.Array]:
    """Accuracy@Npx over all corners + mean distance, from (B, K) pixel
    distances. Covers both the custom-pose 3px/6px metrics and the YOLO
    evaluator's 5/10/20px thresholds."""
    out: Dict[str, jax.Array] = {
        "mean_corner_distance": jnp.mean(distances_px),
        "median_corner_distance": jnp.median(distances_px),
    }
    for t in thresholds:
        out[f"corner_acc_{int(t)}px"] = jnp.mean(
            (distances_px <= t).astype(jnp.float32)
        ) * 100.0
    for k in range(distances_px.shape[1]):
        out[f"corner_{k}_mean_distance"] = jnp.mean(distances_px[:, k])
    return out
