"""Sharded train/eval steps + early stopping.

The hot loop (behavioral spec: train/train.py:67-153) re-designed TPU-first:

- ONE jitted function per step: forward (bf16) + loss + backward + optimizer
  + metric stats, all fused by XLA. No GradScaler — bf16 needs no loss
  scaling (replaces torch.amp, train/train.py:96-104).
- GSPMD parallelism: the batch arrives sharded (data x space axes, see
  parallel/mesh.py); params/opt-state are replicated. Because loss and BN
  statistics are global means, XLA inserts the gradient all-reduce over ICI
  automatically — there is no hand-written collective here by design.
- ``donate_argnums=0``: the previous step's state buffers are reused in
  place, halving HBM traffic for the optimizer update.
- Per-batch metric stats stay on device as a small pytree; the host only
  pulls scalars when logging (reference syncs .item() every batch,
  train/train.py:111 — we only transfer at the log cadence).
"""

from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtg_card_image_segmentation_tpu import losses as losses_lib
from mtg_card_image_segmentation_tpu import metrics as metrics_lib
from mtg_card_image_segmentation_tpu.parallel.mesh import batch_spec, is_trivial, mask_spec
from mtg_card_image_segmentation_tpu.training.state import SegTrainState


def make_train_step(
    dice_weight: float = 0.5,
    ce_weight: float = 0.5,
    num_classes: int = 2,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Build the jitted segmentation train step.

    Returns ``step(state, images, masks) -> (state, stats)`` where ``stats``
    is a device pytree consumable by :class:`metrics.MetricsAccumulator`.
    """

    def train_step(state: SegTrainState, images: jax.Array, masks: jax.Array):
        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = losses_lib.combined_loss(
                logits, masks, dice_weight=dice_weight, ce_weight=ce_weight
            )
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        stats = metrics_lib.segmentation_batch_stats(loss, logits, masks, num_classes)
        return state, stats

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        kwargs["in_shardings"] = (
            replicated,
            NamedSharding(mesh, batch_spec()),
            NamedSharding(mesh, mask_spec()),
        )
        kwargs["out_shardings"] = (replicated, replicated)
    return jax.jit(train_step, **kwargs)


def make_eval_step(
    dice_weight: float = 0.5,
    ce_weight: float = 0.5,
    num_classes: int = 2,
    mesh: Optional[Mesh] = None,
):
    """Jitted eval step: loss + per-batch stats + exact confusion counts.

    ``weights`` (optional, per-image 0/1): padded rows of the last eval batch
    carry 0 so they contribute no exact confusion counts. The smoothed
    per-batch stats remain whole-batch (they are running training-log
    metrics; the honest dataset numbers come from the weighted counts).
    """

    def eval_step(
        state: SegTrainState,
        images: jax.Array,
        masks: jax.Array,
        weights: jax.Array,
    ):
        logits = state.apply_fn(state.variables(), images, train=False)
        loss = losses_lib.combined_loss(
            logits, masks, dice_weight=dice_weight, ce_weight=ce_weight
        )
        stats = metrics_lib.segmentation_batch_stats(loss, logits, masks, num_classes)
        cm = metrics_lib.confusion_matrix(
            jnp.argmax(logits, axis=-1), masks, num_classes, weights
        )
        return stats, cm

    kwargs: Dict[str, Any] = {}
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        kwargs["in_shardings"] = (
            replicated,
            NamedSharding(mesh, batch_spec()),
            NamedSharding(mesh, mask_spec()),
            replicated,
        )
        kwargs["out_shardings"] = (replicated, replicated)
    jitted = jax.jit(eval_step, **kwargs)

    def call(state, images, masks, weights=None):
        if weights is None:
            weights = jnp.ones((images.shape[0],), jnp.int32)
        return jitted(state, images, masks, weights)

    return call


def make_pose_train_step(mesh: Optional[Mesh] = None, donate: bool = True):
    """Jitted pose train step: MSE heatmap loss (CornerLoss semantics,
    train-pose-estimation_custom/metrics.py:105-136)."""

    def train_step(state: SegTrainState, images: jax.Array, targets: jax.Array):
        def loss_fn(params):
            heatmaps, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = losses_lib.heatmap_mse_loss(heatmaps, targets)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        stats = {"loss": loss.astype(jnp.float32), "count": jnp.asarray(1.0)}
        return state, stats

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, batch_spec())
        kwargs["in_shardings"] = (replicated, batch_sh, batch_sh)
        kwargs["out_shardings"] = (replicated, replicated)
    return jax.jit(train_step, **kwargs)


def make_pose_eval_step(image_hw: tuple[int, int], mesh: Optional[Mesh] = None):
    """Jitted pose eval: loss + per-corner pixel distances (decode of both
    pred and target heatmaps, scaled to image pixels — CornerMetrics,
    metrics.py:29-73; sub-pixel quadratic decode on both sides so the
    validation metric matches the PoseEvaluator/serving decode)."""
    from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib
    from mtg_card_image_segmentation_tpu import metrics as seg_metrics

    def eval_step(state: SegTrainState, images: jax.Array, targets: jax.Array):
        heatmaps = state.apply_fn(state.variables(), images, train=False)
        loss = losses_lib.heatmap_mse_loss(heatmaps, targets)
        pred_xy, _ = hm_lib.decode_argmax_subpixel(heatmaps)
        tgt_xy, _ = hm_lib.decode_argmax_subpixel(targets)
        distances = seg_metrics.corner_distances(pred_xy, tgt_xy, image_hw)
        return {"loss": loss.astype(jnp.float32), "count": jnp.asarray(1.0)}, distances

    kwargs: Dict[str, Any] = {}
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, batch_spec())
        kwargs["in_shardings"] = (replicated, batch_sh, batch_sh)
        kwargs["out_shardings"] = (replicated, replicated)
    return jax.jit(eval_step, **kwargs)


def recalibrate_batch_stats(state, recal_model, batches, mesh=None):
    """Exact BatchNorm running-stat recalibration.

    With the reference's BN momentum (torch 0.01 / flax 0.99, torchvision
    mobilenetv3) running stats need ~500 steps to leave their unit-variance
    init; short runs, pruning fine-tunes and freshly-surgered exports all
    eval garbage until recalibrated. ``recal_model`` must be the same
    architecture built with ``bn_momentum=0.0`` — one train-mode pass then
    yields each batch's *exact* statistics, which are averaged over
    ``batches`` and written back into the state. (Averaging per-batch
    variances slightly under-counts between-batch mean variance; negligible
    for iid recalibration batches.)
    """

    def batch_stats_of(params, batch_stats, images):
        _, mutated = recal_model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return mutated["batch_stats"]

    kwargs: Dict[str, Any] = {}
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        kwargs["in_shardings"] = (
            replicated,
            replicated,
            NamedSharding(mesh, batch_spec()),
        )
        kwargs["out_shardings"] = replicated
    stats_fn = jax.jit(batch_stats_of, **kwargs)

    acc = None
    n = 0
    for images in batches:
        stats = stats_fn(state.params, state.batch_stats, images)
        acc = stats if acc is None else jax.tree.map(jnp.add, acc, stats)
        n += 1
    if acc is None:
        return state
    return state.replace(batch_stats=jax.tree.map(lambda x: x / n, acc))


class EarlyStopping:
    """Max/min-mode early stopping with best-state restore
    (train/train.py:23-65 + the pose variant's min mode, metrics.py:213-275).

    Keeps the best state's arrays on host (numpy) so HBM isn't doubled.
    """

    def __init__(
        self, patience: int = 15, min_delta: float = 0.0, mode: str = "max"
    ) -> None:
        assert mode in ("max", "min")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False
        self._best_state_host: Any = None

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return value > self.best + self.min_delta
        return value < self.best - self.min_delta

    def __call__(self, value: float, state: Any = None) -> bool:
        """Returns True when training should stop."""
        if self._improved(value):
            self.best = value
            self.counter = 0
            if state is not None:
                self._best_state_host = jax.tree.map(
                    lambda x: np.asarray(x), (state.params, state.batch_stats)
                )
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def restore_best(self, state):
        """Return ``state`` with the best seen params/batch-stats."""
        if self._best_state_host is None:
            return state
        params, batch_stats = self._best_state_host
        return state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, batch_stats),
        )
