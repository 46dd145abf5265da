"""Segmentation / pose losses.

Semantics match the reference exactly (so trained checkpoints hit the same
optima) but are pure functions over NHWC logits:

- ``dice_loss``: softmax -> one-hot -> *globally flattened* dice with
  smooth=1e-6 (reference DiceLoss, train/utils.py:15-56 — note it flattens
  across batch, classes and pixels into one dice, not per-class).
- ``cross_entropy_loss``: mean softmax-CE over all pixels
  (``nn.CrossEntropyLoss`` default reduction).
- ``combined_loss``: w_dice * dice + w_ce * ce (train/utils.py:58-92).
- ``heatmap_mse_loss``: plain MSE on keypoint heatmaps
  (train-pose-estimation_custom/metrics.py:105-136).

All reductions are over global arrays, so under a sharded jit the means lower
to psums over ICI — loss values are identical on 1 or N chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(logits: jax.Array, targets: jax.Array, smooth: float = 1e-6) -> jax.Array:
    """Global dice loss.

    Args:
      logits: (B, H, W, C) raw scores.
      targets: (B, H, W) int class ids.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    intersection = jnp.sum(probs * one_hot)
    denom = jnp.sum(probs) + jnp.sum(one_hot)
    dice = (2.0 * intersection + smooth) / (denom + smooth)
    return 1.0 - dice


def cross_entropy_loss(
    logits: jax.Array, targets: jax.Array, class_weights: jax.Array | None = None
) -> jax.Array:
    """Mean softmax cross-entropy over all pixels. With ``class_weights`` the
    mean is weighted per torch ``CrossEntropyLoss(weight=...)`` semantics."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[targets]
    return jnp.sum(nll * w) / jnp.sum(w)


def combined_loss(
    logits: jax.Array,
    targets: jax.Array,
    dice_weight: float = 0.5,
    ce_weight: float = 0.5,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    return dice_weight * dice_loss(logits, targets) + ce_weight * cross_entropy_loss(
        logits, targets, class_weights
    )


def heatmap_mse_loss(pred_heatmaps: jax.Array, target_heatmaps: jax.Array) -> jax.Array:
    """Mean-squared error over (B, H, W, K) keypoint heatmaps."""
    diff = pred_heatmaps.astype(jnp.float32) - target_heatmaps.astype(jnp.float32)
    return jnp.mean(diff * diff)
