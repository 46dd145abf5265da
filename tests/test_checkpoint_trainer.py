"""Checkpoint roundtrip + full SegTrainer epoch loop on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import default_config
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.training import (
    checkpoint as ckpt_lib,
    create_optimizer,
    create_seg_state,
)
from mtg_card_image_segmentation_tpu.config import OptimizerConfig


def _tiny_state(seed=0):
    import tiny  # noqa: F401  (registers tiny_seg)

    model = create_model("tiny_seg")
    tx, _ = create_optimizer(OptimizerConfig(), 1, 10)
    return create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(seed))


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(42))
    path = ckpt_lib.save_checkpoint(
        str(tmp_path), "best_model", state, epoch=7, best_metric=0.91,
        history={"train_loss": [1.0, 0.5]}, config={"x": 1},
    )
    assert path

    fresh = _tiny_state(seed=1)
    # params differ before restore (whole-tree distance; single leaves can be
    # seed-independent, e.g. BN scales)
    def tree_dist(x, y):
        return sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(x), jax.tree.leaves(y))
        )

    assert tree_dist(state.params, fresh.params) > 1e-3

    restored, meta = ckpt_lib.load_checkpoint(str(tmp_path), "best_model", fresh)
    assert tree_dist(restored.params, state.params) == 0.0
    assert int(restored.step) == 42
    assert meta["epoch"] == 7 and abs(meta["best_metric"] - 0.91) < 1e-9
    assert meta["history"]["train_loss"] == [1.0, 0.5]

    assert ckpt_lib.latest_checkpoint_name(str(tmp_path)) == "best_model"
    assert ckpt_lib.latest_checkpoint_name(str(tmp_path / "nope")) is None

    # template-free read (the serving/eval/export consumer path)
    params, batch_stats, meta2 = ckpt_lib.load_params(str(tmp_path), "best_model")
    assert tree_dist(params, state.params) == 0.0
    assert meta2["epoch"] == 7


def test_load_params_missing_checkpoint_is_clear(tmp_path):
    """A meta.json-only directory (checkpoint binaries are gitignored across
    rounds) must fail with a FileNotFoundError naming the path — orbax's raw
    AttributeError('NoneType' ... .tree) cost a debugging session."""
    (tmp_path / "gone.meta.json").write_text("{}")
    with pytest.raises(FileNotFoundError, match="no orbax checkpoint"):
        ckpt_lib.load_params(str(tmp_path), "gone")


@pytest.mark.slow
def test_seg_trainer_epoch_loop(tmp_path, mesh8):
    """Two tiny epochs end-to-end: history, best checkpoint, resume."""
    from mtg_card_image_segmentation_tpu.training.trainer import SegTrainer

    cfg = default_config().override(
        {
            "model": {"input_height": 32, "input_width": 32, "compute_dtype": "float32"},
            "data": {"batch_size": 8},
            "train": {
                "num_epochs": 2,
                "steps_per_epoch": 3,
                "save_every_epochs": 1,
                "log_every_steps": 2,
                "checkpoint_dir": str(tmp_path / "ckpts"),
                "log_dir": str(tmp_path / "logs"),
            },
            "optimizer": {"warmup_epochs": 0},
        }
    )
    trainer = SegTrainer(cfg, mesh=mesh8)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    imgs = np.asarray(jax.image.resize(jnp.asarray(base), (8, 32, 32, 3), "linear"))
    masks = (imgs[..., 0] > 0).astype(np.int32)
    from mtg_card_image_segmentation_tpu.parallel import shard_batch

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
    assert (tmp_path / "ckpts" / "history.json").is_file()

    # resume from latest and confirm epoch advances
    trainer2 = SegTrainer(cfg, mesh=mesh8)
    trainer2.resume()
    assert trainer2.start_epoch >= 1
    assert trainer2.history  # carried over


def test_history_plot(tmp_path):
    from mtg_card_image_segmentation_tpu.utils.plots import (
        plot_confusion_matrix,
        plot_training_history,
    )

    h = {
        "train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
        "train_mean_iou": [0.3, 0.6], "val_mean_iou": [0.2, 0.5],
        "train_pixel_accuracy": [0.7, 0.9], "val_pixel_accuracy": [0.6, 0.8],
        "train_mean_dice": [0.4, 0.7], "val_mean_dice": [0.3, 0.6],
    }
    out = plot_training_history(h, str(tmp_path / "hist.png"))
    assert (tmp_path / "hist.png").stat().st_size > 1000
    out2 = plot_confusion_matrix(
        np.array([[500, 20], [10, 470]]), str(tmp_path / "cm.png")
    )
    assert (tmp_path / "cm.png").stat().st_size > 1000
