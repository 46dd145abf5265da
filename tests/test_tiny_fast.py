"""Fast default-run variants of the full-model end-to-end tests.

Each test here mirrors a ``-m slow`` full-model test one-for-one (same
machinery, tiny 2-conv models): train-step learning under GSPMD sharding,
BN recalibration, trainer epoch loop + resume, pose step, YOLO loss/decode
on fabricated pyramid outputs, and BN folding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import tiny  # noqa: F401  (registers tiny_seg / tiny_pose)
from mtg_card_image_segmentation_tpu.config import OptimizerConfig, default_config
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.parallel import shard_batch
from mtg_card_image_segmentation_tpu.training import (
    create_optimizer,
    create_seg_state,
    make_eval_step,
    make_train_step,
    recalibrate_batch_stats,
)
from mtg_card_image_segmentation_tpu import metrics as metrics_lib


def _toy_batch(n=8, size=32, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, 4, 4, 3)).astype(np.float32)
    imgs = np.asarray(jax.image.resize(jnp.asarray(base), (n, size, size, 3), "linear"))
    masks = (imgs[..., 0] > 0).astype(np.int32)
    return imgs, masks


def test_tiny_train_step_learns_on_mesh(mesh8):
    model = create_model("tiny_seg")
    tx, _ = create_optimizer(OptimizerConfig(learning_rate=3e-3), 1, 10)
    state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))
    imgs, masks = _toy_batch()
    images_d, masks_d = shard_batch(mesh8, imgs, masks)
    step = make_train_step(mesh=mesh8)
    losses = []
    for _ in range(12):
        state, stats = step(state, images_d, masks_d)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses

    eval_step = make_eval_step(mesh=mesh8)
    stats, cm = eval_step(state, images_d, masks_d)
    cm = np.asarray(cm)
    assert cm.sum() == masks.size
    assert metrics_lib.metrics_from_confusion(cm)["pixel_accuracy"] > 0.5


def test_tiny_bn_recalibration(mesh8):
    model = create_model("tiny_seg")
    recal_model = create_model("tiny_seg", bn_momentum=0.0)
    tx, _ = create_optimizer(OptimizerConfig(learning_rate=3e-3), 1, 10)
    state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))
    imgs, masks = _toy_batch()
    images_d, masks_d = shard_batch(mesh8, imgs, masks)
    step = make_train_step(mesh=mesh8)
    for _ in range(10):
        state, _ = step(state, images_d, masks_d)
    state2 = recalibrate_batch_stats(state, recal_model, [images_d], mesh=mesh8)
    # recalibrated stats equal the batch's exact statistics -> eval matches
    # train-mode behavior on that batch
    eval_step = make_eval_step(mesh=mesh8)
    _, cm_before = eval_step(state, images_d, masks_d)
    _, cm_after = eval_step(state2, images_d, masks_d)
    a = metrics_lib.metrics_from_confusion(np.asarray(cm_after))
    b = metrics_lib.metrics_from_confusion(np.asarray(cm_before))
    assert a["pixel_accuracy"] >= b["pixel_accuracy"] - 0.02
    # stats actually moved off the init identity
    flat = jax.tree.leaves(state2.batch_stats)
    assert any(float(np.abs(np.asarray(x)).sum()) > 1e-3 for x in flat)


def test_tiny_trainer_epoch_loop(tmp_path, mesh8):
    """Two epochs end-to-end through SegTrainer with the tiny model:
    history, best/final checkpoints, resume (mirror of the slow
    test_seg_trainer_epoch_loop)."""
    from mtg_card_image_segmentation_tpu.training.trainer import SegTrainer

    cfg = default_config().override(
        {
            "model": {"name": "tiny_seg", "input_height": 32, "input_width": 32,
                      "inter_channels": 8, "compute_dtype": "float32"},
            "data": {"batch_size": 8},
            "train": {
                "num_epochs": 2, "steps_per_epoch": 3, "save_every_epochs": 1,
                "log_every_steps": 2,
                "checkpoint_dir": str(tmp_path / "ckpts"),
                "log_dir": str(tmp_path / "logs"),
            },
            "optimizer": {"warmup_epochs": 0},
        }
    )
    trainer = SegTrainer(cfg, mesh=mesh8)
    imgs, masks = _toy_batch()
    images_d, masks_d = shard_batch(mesh8, imgs, masks)

    def forever():
        while True:
            yield images_d, masks_d

    history = trainer.train(
        forever(),
        make_val_batches=lambda: [(images_d, masks_d)],
        make_recal_batches=lambda: [images_d],
    )
    assert len(history["train_loss"]) == 2
    assert len(history["val_mean_iou"]) == 2
    assert (tmp_path / "ckpts" / "best_model").is_dir()
    assert (tmp_path / "ckpts" / "final_model").is_dir()

    trainer2 = SegTrainer(cfg, mesh=mesh8)
    trainer2.resume()
    assert trainer2.start_epoch >= 1
    assert trainer2.history


def test_tiny_pose_train_step_learns(mesh8):
    from mtg_card_image_segmentation_tpu.training.loop import (
        make_pose_eval_step,
        make_pose_train_step,
    )
    from mtg_card_image_segmentation_tpu.ops.heatmap import gaussian_heatmaps_batch

    model = create_model("tiny_pose", heatmap_height=16, heatmap_width=16)
    tx = optax.adamw(3e-3)
    state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    coords = jnp.asarray(
        np.tile(np.array([[[4, 4], [12, 4], [12, 12], [4, 12]]], np.float32), (8, 1, 1))
    )
    targets = gaussian_heatmaps_batch(coords, 16, 16, 1.5)
    images_d = shard_batch(mesh8, images)
    targets_d = shard_batch(mesh8, np.asarray(targets))
    step = make_pose_train_step(mesh=mesh8)
    losses = []
    for _ in range(15):
        state, stats = step(state, images_d, targets_d)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0], losses

    eval_step = make_pose_eval_step((32, 32), mesh=mesh8)
    stats, distances = eval_step(state, images_d, targets_d)
    assert np.asarray(distances).shape == (8, 4)


def _fake_level_outputs(rng, batch, size, nc=1, k=4, kd=3, reg_max=16):
    outs = []
    for s in (8, 16, 32):
        h = w = size // s
        c = 4 * reg_max + nc + k * kd
        outs.append(jnp.asarray(
            rng.standard_normal((batch, h, w, c)).astype(np.float32) * 0.1
        ))
    return outs


def test_tiny_yolo_loss_and_decode():
    """yolo_pose_loss + decode_predictions + top1_detection on fabricated
    pyramid outputs (mirror of the slow full-model decode/loss tests)."""
    from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
        decode_predictions,
        top1_detection,
    )
    from mtg_card_image_segmentation_tpu.training.yolo_loss import yolo_pose_loss

    rng = np.random.default_rng(0)
    outs = _fake_level_outputs(rng, batch=2, size=64)
    boxes, scores, kpts = decode_predictions(outs)
    a = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert boxes.shape == (2, a, 4)
    assert scores.shape == (2, a, 1)
    assert kpts.shape == (2, a, 4, 3)
    bb, conf, kk = top1_detection(boxes, scores, kpts)
    assert bb.shape == (2, 4) and kk.shape == (2, 4, 3)
    assert np.all(np.asarray(conf) >= 0) and np.all(np.asarray(conf) <= 1)

    corners = jnp.asarray(
        np.tile(np.array([[[16, 12], [48, 12], [48, 52], [16, 52]]], np.float32),
                (2, 1, 1))
    )
    loss, parts = yolo_pose_loss(outs, corners)
    assert np.isfinite(float(loss))
    for key in ("cls_loss", "box_loss", "dfl_loss", "kpt_loss", "kobj_loss"):
        assert np.isfinite(float(parts[key])), key


def test_tiny_fold_bn_matches():
    """BN folding on the tiny model: folded(params) under fold_bn=True model
    == original eval output (mirror of test_folded_model_matches_original)."""
    from mtg_card_image_segmentation_tpu.export import fold_batch_norm

    model = create_model("tiny_seg")
    folded_model = create_model("tiny_seg", fold_bn=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.key(0))
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    ref = model.apply(variables, x, train=False)
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])
    out = folded_model.apply({"params": folded}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_slim_parity_default_guard():
    """Default-run guard of the slimming exactness invariant (the full
    test_slim.py numeric-parity tests are -m slow only): expansion-prune ->
    slim -> slim model output == masked model output, at tiny 64x48
    geometry so it runs in the default suite."""
    from mtg_card_image_segmentation_tpu.compression.slim import (
        expansion_channel_prune,
        param_count,
        slim_seg_state,
    )

    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.key(0))

    pruned, _ = expansion_channel_prune(variables["params"], amount=0.3)
    slim_params, slim_stats, overrides = slim_seg_state(
        pruned, variables["batch_stats"]
    )
    slim_model = create_model(
        "lraspp_mobilenet_v3_large", compute_dtype="float32",
        expanded_overrides=overrides,
    )
    xr = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 48, 3)), jnp.float32
    )
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": pruned, "batch_stats": variables["batch_stats"]}, xr
    )
    got = jax.jit(lambda v, x: slim_model.apply(v, x, train=False))(
        {"params": slim_params, "batch_stats": slim_stats}, xr
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert param_count(slim_params) < param_count(variables["params"])
