"""Training subsystem: schedules, sharded train/eval step, early stopping.

The train-step test runs the real 4.2M-param model on the 8-device CPU mesh
with a learnable toy task and asserts the loss drops — an end-to-end check of
forward/backward/optimizer under GSPMD sharding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import OptimizerConfig
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.parallel import shard_batch
from mtg_card_image_segmentation_tpu.training import (
    EarlyStopping,
    create_optimizer,
    create_schedule,
    create_seg_state,
    make_eval_step,
    make_train_step,
)
from mtg_card_image_segmentation_tpu import metrics as metrics_lib


def test_cosine_schedule_matches_reference_endpoints():
    cfg = OptimizerConfig(schedule="cosine", learning_rate=1e-3, warmup_epochs=0)
    sched = create_schedule(cfg, num_epochs=100, steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    # end value = lr * 0.01 (reference eta_min, train/train.py:196)
    assert abs(float(sched(1000)) - 1e-5) < 1e-7
    # halfway = midpoint of cosine
    mid = float(sched(500))
    assert abs(mid - (1e-3 + 1e-5) / 2) < 1e-6


def test_warmup_schedule():
    cfg = OptimizerConfig(schedule="cosine", learning_rate=1e-3, warmup_epochs=5)
    sched = create_schedule(cfg, num_epochs=100, steps_per_epoch=10)
    assert float(sched(0)) < 1e-4
    assert abs(float(sched(50)) - 1e-3) < 1e-5


def test_cosine_restarts_resets():
    cfg = OptimizerConfig(schedule="cosine_restarts", learning_rate=1e-3, warmup_epochs=0)
    sched = create_schedule(cfg, num_epochs=100, steps_per_epoch=10)
    # first cycle = 25 epochs = 250 steps; just after restart lr jumps back up
    assert float(sched(249)) < 1e-4
    assert float(sched(251)) > 9e-4


def test_sgd_and_unknown():
    tx, _ = create_optimizer(OptimizerConfig(name="sgd"), 10, 10)
    assert tx is not None
    with pytest.raises(ValueError):
        create_optimizer(OptimizerConfig(name="lion"), 10, 10)


@pytest.mark.slow
def test_train_step_learns_on_mesh(mesh8):
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    tx, _ = create_optimizer(OptimizerConfig(learning_rate=3e-3), 1, 10)
    state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))

    # toy task: mask = (red channel > 0) on smooth blobs
    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    imgs_small = jax.image.resize(jnp.asarray(base), (8, 32, 32, 3), "linear")
    imgs = np.asarray(imgs_small)
    masks = (imgs[..., 0] > 0).astype(np.int32)

    step = make_train_step(mesh=mesh8)
    images_d, masks_d = shard_batch(mesh8, imgs, masks)
    acc = metrics_lib.MetricsAccumulator()
    losses = []
    for i in range(12):
        state, stats = step(state, images_d, masks_d)
        losses.append(float(stats["loss"]))
        acc.update(stats)
    assert losses[-1] < losses[0] * 0.8, losses
    out = acc.result()
    assert 0 <= out["pixel_accuracy"] <= 1

    # eval step produces stats + exact confusion counts
    eval_step = make_eval_step(mesh=mesh8)
    stats, cm = eval_step(state, images_d, masks_d)
    cm = np.asarray(cm)
    assert cm.sum() == masks.size
    m = metrics_lib.metrics_from_confusion(cm)
    assert m["pixel_accuracy"] > 0.5


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=2, mode="max")
    assert not es(0.5)
    assert not es(0.6)
    assert not es(0.55)  # no improvement 1
    assert es(0.55) or es.counter >= 2 or not es.should_stop
    # after 2 non-improvements, stop
    es2 = EarlyStopping(patience=2, mode="max")
    es2(0.5)
    es2(0.4)
    stopped = es2(0.4)
    assert stopped and es2.should_stop
    assert es2.best == 0.5


def test_early_stopping_min_mode_restore():
    class FakeState:
        def __init__(self, v):
            self.params = {"w": jnp.asarray(v)}
            self.batch_stats = {}

        def replace(self, params=None, batch_stats=None):
            s = FakeState(0.0)
            s.params = params
            s.batch_stats = batch_stats
            return s

    es = EarlyStopping(patience=3, mode="min")
    es(1.0, FakeState(1.0))
    es(0.5, FakeState(2.0))  # best
    es(0.7, FakeState(3.0))
    restored = es.restore_best(FakeState(9.0))
    assert float(restored.params["w"]) == 2.0


@pytest.mark.slow
def test_bn_recalibration_fixes_stale_stats(mesh8):
    """After a few train steps, momentum-0.99 running stats are still near
    init and eval collapses; exact recalibration recovers batch-stats-level
    quality (the bug this guards was found live: eval IoU 0.017 vs 0.84)."""
    from mtg_card_image_segmentation_tpu.training import recalibrate_batch_stats

    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    recal_model = create_model(
        "lraspp_mobilenet_v3_large", compute_dtype="float32", bn_momentum=0.0
    )
    tx, _ = create_optimizer(OptimizerConfig(learning_rate=3e-3), 1, 10)
    state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))

    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    imgs = np.asarray(jax.image.resize(jnp.asarray(base), (8, 32, 32, 3), "linear"))
    masks = (imgs[..., 0] > 0).astype(np.int32)
    images_d, masks_d = shard_batch(mesh8, imgs, masks)

    step = make_train_step(mesh=mesh8)
    for _ in range(15):
        state, _ = step(state, images_d, masks_d)

    eval_step = make_eval_step(mesh=mesh8)
    _, cm_before = eval_step(state, images_d, masks_d)
    acc_before = metrics_lib.metrics_from_confusion(np.asarray(cm_before))

    state = recalibrate_batch_stats(state, recal_model, [images_d], mesh=mesh8)
    _, cm_after = eval_step(state, images_d, masks_d)
    acc_after = metrics_lib.metrics_from_confusion(np.asarray(cm_after))
    assert acc_after["pixel_accuracy"] >= acc_before["pixel_accuracy"] - 0.02
    assert acc_after["pixel_accuracy"] > 0.85
