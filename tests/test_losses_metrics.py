"""Losses/metrics vs torch reference semantics (train/utils.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mtg_card_image_segmentation_tpu import losses, metrics

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _rand_batch(b=2, h=16, w=12, c=2, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    return logits, targets


def _to_torch(logits, targets):
    return (
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(targets.astype(np.int64)),
    )


def _torch_dice(logits_t, targets_t, smooth=1e-6):
    p = F.softmax(logits_t, dim=1).reshape(-1)
    oh = F.one_hot(targets_t, 2).permute(0, 3, 1, 2).float().reshape(-1)
    inter = (p * oh).sum()
    return 1 - (2 * inter + smooth) / (p.sum() + oh.sum() + smooth)


def test_dice_loss_matches_reference():
    logits, targets = _rand_batch()
    lt, tt = _to_torch(logits, targets)
    ours = float(losses.dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(_torch_dice(lt, tt))
    assert abs(ours - ref) < 1e-6


def test_ce_loss_matches_reference():
    logits, targets = _rand_batch(seed=1)
    lt, tt = _to_torch(logits, targets)
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.cross_entropy(lt, tt))
    assert abs(ours - ref) < 1e-6


def test_ce_loss_class_weights():
    logits, targets = _rand_batch(seed=2)
    lt, tt = _to_torch(logits, targets)
    w = np.array([0.3, 0.7], np.float32)
    ours = float(
        losses.cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)
        )
    )
    ref = float(F.cross_entropy(lt, tt, weight=torch.from_numpy(w)))
    assert abs(ours - ref) < 1e-6


def test_combined_loss_weighting():
    logits, targets = _rand_batch(seed=3)
    jl, jt = jnp.asarray(logits), jnp.asarray(targets)
    combined = float(losses.combined_loss(jl, jt, 0.5, 0.5))
    manual = 0.5 * float(losses.dice_loss(jl, jt)) + 0.5 * float(
        losses.cross_entropy_loss(jl, jt)
    )
    assert abs(combined - manual) < 1e-7


def test_heatmap_mse_matches_torch():
    rng = np.random.default_rng(4)
    pred = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = float(losses.heatmap_mse_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    ref = float(F.mse_loss(torch.from_numpy(pred), torch.from_numpy(tgt)))
    assert abs(ours - ref) < 1e-6


def test_batch_iou_dice_match_reference_formulas():
    logits, targets = _rand_batch(seed=5)
    pred = np.argmax(logits, axis=-1)
    for cls in range(2):
        p = (pred == cls).astype(np.float64)
        t = (targets == cls).astype(np.float64)
        inter = (p * t).sum()
        union = p.sum() + t.sum() - inter
        iou_ref = (inter + 1e-6) / (union + 1e-6)
        dice_ref = (2 * inter + 1e-6) / (p.sum() + t.sum() + 1e-6)
        iou = np.asarray(metrics.batch_iou(jnp.asarray(logits), jnp.asarray(targets)))
        dice = np.asarray(metrics.batch_dice(jnp.asarray(logits), jnp.asarray(targets)))
        np.testing.assert_allclose(iou[cls], iou_ref, rtol=1e-6)
        np.testing.assert_allclose(dice[cls], dice_ref, rtol=1e-6)


def test_confusion_matrix_exact():
    logits, targets = _rand_batch(seed=6)
    pred = jnp.argmax(jnp.asarray(logits), axis=-1)
    cm = np.asarray(metrics.confusion_matrix(pred, jnp.asarray(targets), 2))
    pred_np = np.asarray(pred)
    for t in range(2):
        for p in range(2):
            assert cm[t, p] == np.sum((targets == t) & (pred_np == p))
    m = metrics.metrics_from_confusion(cm)
    assert 0.0 <= m["pixel_accuracy"] <= 1.0
    # IoU from CM == exact IoU
    inter = cm[1, 1]
    union = cm[1, 1] + cm[0, 1] + cm[1, 0]
    np.testing.assert_allclose(m["iou_card"], inter / union)


def test_metrics_accumulator_averages():
    acc = metrics.MetricsAccumulator()
    for seed in range(3):
        logits, targets = _rand_batch(seed=seed)
        stats = metrics.segmentation_batch_stats(
            jnp.asarray(0.5), jnp.asarray(logits), jnp.asarray(targets)
        )
        acc.update(stats)
    out = acc.result()
    assert abs(out["loss"] - 0.5) < 1e-6
    assert set(out) >= {
        "loss",
        "mean_iou",
        "mean_dice",
        "pixel_accuracy",
        "iou_card",
        "iou_background",
        "dice_card",
        "dice_background",
    }


def test_corner_metrics():
    pred = jnp.asarray([[[0.5, 0.5], [0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    tgt = jnp.asarray([[[0.5, 0.5], [0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    d = metrics.corner_distances(pred, tgt, image_size=(480, 640))
    assert d.shape == (1, 4)
    m = metrics.corner_metrics(d)
    assert float(m["corner_acc_3px"]) == 100.0
    assert float(m["mean_corner_distance"]) < 1e-3
    # shift one corner by 8px in x
    pred2 = pred.at[0, 1, 0].add(8.0 / 640.0)
    d2 = metrics.corner_distances(pred2, tgt, image_size=(480, 640))
    m2 = metrics.corner_metrics(d2)
    assert float(m2["corner_acc_6px"]) == 75.0
    assert float(m2["corner_acc_10px"]) == 100.0
