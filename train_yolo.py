#!/usr/bin/env python
"""YOLO12n-pose corner training CLI
(reference entry point: python train-pose-estimation_yolo12n/train.py,
which delegates to ultralytics model.train(); here the loss/assigner are
native — training/yolo_loss.py).

  python train_yolo.py --set train.num_epochs=5 data.batch_size=16
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--imgsz", type=int, default=640, help="square input size")
    parser.add_argument("--resume", nargs="?", const="__latest__", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mtg_card_image_segmentation_tpu import metrics as metrics_lib
    from mtg_card_image_segmentation_tpu.config import Config, default_config
    from mtg_card_image_segmentation_tpu.data.synthetic import (
        synthetic_augmented_batch,
        synthetic_batch,
    )
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.models.yolo12_pose import top1_detection
    from mtg_card_image_segmentation_tpu.parallel import make_mesh
    from mtg_card_image_segmentation_tpu.training import (
        checkpoint as ckpt_lib,
        create_optimizer,
        create_seg_state,
    )
    from mtg_card_image_segmentation_tpu.training.yolo_loss import make_yolo_train_step
    from mtg_card_image_segmentation_tpu.utils.logging import setup_logger

    cfg = Config.from_json(args.config) if args.config else default_config()
    cfg = cfg.override(
        {"train": {"early_stopping_metric": "mean_corner_distance",
                   "early_stopping_mode": "min"}}
    )
    if args.set:
        cfg = cfg.with_cli(args.set)
    log = setup_logger(log_dir=cfg.train.log_dir)
    mesh = make_mesh()
    size = args.imgsz
    batch = cfg.data.batch_size
    steps = cfg.train.steps_per_epoch or max(1, 8800 // batch)

    model = create_model("yolo12n_pose")
    tx, schedule = create_optimizer(cfg.optimizer, cfg.train.num_epochs, steps)
    state = create_seg_state(model, tx, (1, size, size, 3), jax.random.key(cfg.train.seed))
    step_fn = make_yolo_train_step(mesh=mesh)

    aug = cfg.data.augment

    @jax.jit
    def make_batch(key):
        # fused render+augment (zero-gather, synthetic_augmented_sample);
        # keypoint path disables elastic/grid so corners stay exact
        s = synthetic_augmented_batch(
            key, batch, size, size, 0.0, aug,
            with_displacement=False, flip_idx=(1, 0, 3, 2),
            keep_in_frame=True,
        )
        return s.image, s.corners

    @jax.jit
    def make_clean_batch(key):
        s = synthetic_batch(key, batch, size, size, 0.0, keep_in_frame=True)
        return s.image, s.corners

    @jax.jit
    def infer_top1(variables, images):
        boxes, scores, kpts = model.apply(variables, images, train=False)
        return top1_detection(boxes, scores, kpts)

    start_epoch = 0
    best = None
    history: dict = {}
    if args.resume is not None:
        name = None if args.resume == "__latest__" else args.resume
        name = name or ckpt_lib.latest_checkpoint_name(cfg.train.checkpoint_dir)
        if name:
            state, meta = ckpt_lib.load_checkpoint(cfg.train.checkpoint_dir, name, state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            best = meta.get("best_metric")
            history = meta.get("history", {}) or {}
            log.info(f"resumed from {name} at epoch {start_epoch}")

    key = jax.random.key(cfg.train.seed + start_epoch)
    for epoch in range(start_epoch, cfg.train.num_epochs):
        t0 = time.time()
        epoch_losses = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            images, corners = make_batch(sub)
            state, parts = step_fn(state, images, corners)
            if (i + 1) % cfg.train.log_every_steps == 0 or i + 1 == steps:
                epoch_losses.append(float(parts["loss"]))
                log.info(
                    f"epoch {epoch + 1}/{cfg.train.num_epochs} step {i + 1}/{steps} "
                    f"loss={float(parts['loss']):.4f} box={float(parts['box_loss']):.3f} "
                    f"kpt={float(parts['kpt_loss']):.3f} cls={float(parts['cls_loss']):.3f}"
                )
        # eval: top-1 corner distances on clean synthetic
        dists = []
        for i in range(4):
            images, corners = make_clean_batch(jax.random.key(10_000 + i))
            _, conf, kpts = infer_top1(state.variables(), images)
            d = np.sqrt(
                ((np.asarray(kpts[..., :2]) - np.asarray(corners)) ** 2).sum(-1)
            )
            dists.append(d)
        d = np.concatenate(dists)
        m = {k: float(v) for k, v in metrics_lib.corner_metrics(jnp.asarray(d)).items()}
        history.setdefault("train_loss", []).append(
            float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        )
        for k, v in m.items():
            history.setdefault(f"val_{k}", []).append(v)
        log.info(
            f"epoch {epoch + 1} VAL mean_dist={m['mean_corner_distance']:.1f}px "
            f"acc5={m['corner_acc_5px']:.1f}% acc10={m['corner_acc_10px']:.1f}% "
            f"acc20={m['corner_acc_20px']:.1f}% ({time.time() - t0:.0f}s)"
        )
        if best is None or m["mean_corner_distance"] < best:
            best = m["mean_corner_distance"]
            ckpt_lib.try_save_checkpoint(
                log, cfg.train.checkpoint_dir, "best_model", state, epoch, best,
                history, cfg.to_dict(),
            )
        if (epoch + 1) % cfg.train.save_every_epochs == 0:
            ckpt_lib.try_save_checkpoint(
                log, cfg.train.checkpoint_dir, f"checkpoint_epoch_{epoch + 1}",
                state, epoch, best, history, cfg.to_dict(),
            )
    ckpt_lib.save_checkpoint(
        cfg.train.checkpoint_dir, "final_model", state,
        cfg.train.num_epochs - 1, best, history, cfg.to_dict(),
    )
    import json as _json
    import os as _os

    with open(_os.path.join(cfg.train.checkpoint_dir, "history.json"), "w") as f:
        _json.dump(history, f, indent=2)
    log.info(f"done; best mean corner distance {best:.1f}px")


if __name__ == "__main__":
    main()
