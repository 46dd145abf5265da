"""High-level segmentation trainer — the epoch driver.

Behavioral spec: train/train.py:209-417 (epoch loop, per-N-batch progress +
ETA, validation each epoch, scheduler, early stopping on mean IoU,
best/periodic/final checkpoints, resume, history JSON + plot, optional
wandb). TPU re-design differences:

- the step is one fused jitted program (training/loop.py) and metric scalars
  only cross to host at the log cadence;
- validation runs after an *exact BN recalibration* pass (training/loop.py)
  so short runs and fine-tunes report honest eval numbers;
- data generation/augmentation is on-device (data/pipeline.py) — the "epoch"
  over the synthetic source is just steps_per_epoch steps of the infinite
  stream (defaults to 8800/batch like the reference dataset scale).
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from mtg_card_image_segmentation_tpu import metrics as metrics_lib
from mtg_card_image_segmentation_tpu.config import Config
from mtg_card_image_segmentation_tpu.models import registry
from mtg_card_image_segmentation_tpu.parallel import make_mesh
from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib
from mtg_card_image_segmentation_tpu.training.loop import (
    EarlyStopping,
    make_eval_step,
    make_train_step,
    recalibrate_batch_stats,
)
from mtg_card_image_segmentation_tpu.training.optim import create_optimizer
from mtg_card_image_segmentation_tpu.training.state import create_seg_state
from mtg_card_image_segmentation_tpu.utils.logging import setup_logger

REFERENCE_TRAIN_IMAGES = 8800  # BASELINE.md dataset scale


class SegTrainer:
    def __init__(self, cfg: Config, mesh=None, lr_scale: float = 1.0) -> None:
        self.cfg = cfg
        hosts = cfg.mesh.hosts
        if hosts == 1 and jax.process_count() > 1:
            hosts = jax.process_count()  # DCN axis defaults to one per host
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.mesh.data, space=cfg.mesh.space, model=cfg.mesh.model,
            hosts=hosts,
        )
        self.log = setup_logger(log_dir=cfg.train.log_dir)
        self.steps_per_epoch = cfg.train.steps_per_epoch or max(
            1, REFERENCE_TRAIN_IMAGES // cfg.data.batch_size
        )

        self.model = registry.from_config(cfg.model)
        self.recal_model = registry.create_model(
            cfg.model.name,
            num_classes=cfg.model.num_classes,
            inter_channels=cfg.model.inter_channels,
            compute_dtype=cfg.model.compute_dtype,
            param_dtype=cfg.model.param_dtype,
            bn_momentum=0.0,
        )
        self.tx, self.schedule = create_optimizer(
            cfg.optimizer, cfg.train.num_epochs, self.steps_per_epoch, lr_scale
        )
        input_shape = (1, cfg.model.input_height, cfg.model.input_width, 3)
        self.state = jax.jit(
            lambda k: create_seg_state(self.model, self.tx, input_shape, k)
        )(jax.random.key(cfg.train.seed))
        self.train_step = make_train_step(
            dice_weight=cfg.train.dice_weight,
            ce_weight=cfg.train.ce_weight,
            num_classes=cfg.model.num_classes,
            mesh=self.mesh,
            donate=cfg.train.donate_state,
        )
        self.eval_step = make_eval_step(
            dice_weight=cfg.train.dice_weight,
            ce_weight=cfg.train.ce_weight,
            num_classes=cfg.model.num_classes,
            mesh=self.mesh,
        )
        self.history: Dict[str, List[float]] = {}
        self.start_epoch = 0
        self.best_metric: Optional[float] = None
        self._wandb = None
        if cfg.train.wandb:  # optional, like the reference (train/train.py:219-224)
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="mtg-card-segmentation-tpu", config=cfg.to_dict())
            except ImportError:
                self.log.warning("wandb requested but not installed — disabled")

    # ------------------------------------------------------------------
    def resume(self, name: Optional[str] = None) -> None:
        ckpt_dir = self.cfg.train.checkpoint_dir
        name = name or ckpt_lib.latest_checkpoint_name(ckpt_dir)
        if name is None:
            self.log.warning("--resume requested but no checkpoint found")
            return
        self.state, meta = ckpt_lib.load_checkpoint(ckpt_dir, name, self.state)
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        self.best_metric = meta.get("best_metric")
        self.history = meta.get("history", {}) or {}
        self.log.info(f"Resumed from {name} at epoch {self.start_epoch}")

    def _append_history(self, prefix: str, stats: Dict[str, float]) -> None:
        for k, v in stats.items():
            self.history.setdefault(f"{prefix}_{k}", []).append(float(v))

    # ------------------------------------------------------------------
    def validate(self, val_batches: Iterable, recal_batches: Iterable) -> Dict[str, float]:
        state = recalibrate_batch_stats(
            self.state, self.recal_model, recal_batches, mesh=self.mesh
        )
        acc = metrics_lib.MetricsAccumulator()
        cmacc = metrics_lib.ConfusionAccumulator(self.cfg.model.num_classes)
        for batch in val_batches:
            images, masks = batch[0], batch[1]
            valid = int(batch[2]) if len(batch) > 2 else images.shape[0]
            # padded tail batch (file pipeline, drop_last=False): weight out
            # the fake rows so exact confusion counts stay honest.
            weights = (np.arange(images.shape[0]) < valid).astype(np.int32)
            stats, cm = self.eval_step(state, images, masks, weights)
            acc.update(stats)
            cmacc.update(cm)
        self.state = state  # keep the recalibrated stats
        out = acc.result()
        out.update({f"exact_{k}": v for k, v in cmacc.result().items()})
        return out

    # ------------------------------------------------------------------
    def train(
        self,
        train_iter,
        make_val_batches,
        make_recal_batches,
    ) -> Dict[str, List[float]]:
        """``train_iter``: infinite iterator of (images, masks) device
        batches. ``make_val_batches`` / ``make_recal_batches``: zero-arg
        callables returning fresh iterables per epoch."""
        cfg = self.cfg
        es = EarlyStopping(
            patience=cfg.train.early_stopping_patience,
            mode=cfg.train.early_stopping_mode,
        )
        ckpt_dir = cfg.train.checkpoint_dir
        metric_key = cfg.train.early_stopping_metric
        t_start = time.time()

        for epoch in range(self.start_epoch, cfg.train.num_epochs):
            t_epoch = time.time()
            acc = metrics_lib.MetricsAccumulator()
            last_stats = None
            for step_i in range(self.steps_per_epoch):
                images, masks = next(train_iter)
                self.state, stats = self.train_step(self.state, images, masks)
                last_stats = stats
                if (step_i + 1) % cfg.train.log_every_steps == 0 or (
                    step_i + 1 == self.steps_per_epoch
                ):
                    acc.update(stats)  # host transfer only at log cadence
                    done = step_i + 1
                    dt = time.time() - t_epoch
                    eta = dt / done * (self.steps_per_epoch - done)
                    self.log.info(
                        f"epoch {epoch + 1}/{cfg.train.num_epochs} "
                        f"step {done}/{self.steps_per_epoch} "
                        f"loss={float(stats['loss']):.4f} "
                        f"lr={float(self.schedule(self.state.step)):.2e} "
                        f"eta={eta:.0f}s"
                    )
            train_stats = acc.result() or metrics_lib.summarize_batch_stats(
                jax.tree.map(np.asarray, last_stats)
            )
            self._append_history("train", train_stats)

            if (epoch + 1) % cfg.train.eval_every_epochs == 0:
                val_stats = self.validate(make_val_batches(), make_recal_batches())
                self._append_history("val", val_stats)
                if self._wandb is not None:
                    self._wandb.log(
                        {f"train/{k}": v for k, v in train_stats.items()}
                        | {f"val/{k}": v for k, v in val_stats.items()},
                        step=epoch + 1,
                    )
                self.log.info(
                    f"epoch {epoch + 1} VAL "
                    f"loss={val_stats['loss']:.4f} "
                    f"mIoU={val_stats['mean_iou']:.4f} "
                    f"iou_card={val_stats.get('iou_card', float('nan')):.4f} "
                    f"pixacc={val_stats['pixel_accuracy']:.4f}"
                )
                metric = val_stats.get(metric_key, val_stats["mean_iou"])
                improved = self.best_metric is None or (
                    metric > self.best_metric
                    if cfg.train.early_stopping_mode == "max"
                    else metric < self.best_metric
                )
                if improved:
                    self.best_metric = metric
                    ckpt_lib.try_save_checkpoint(
                        self.log, ckpt_dir, "best_model", self.state, epoch,
                        self.best_metric, self.history, cfg.to_dict(),
                    )
                    self.log.info(f"new best {metric_key}={metric:.4f} -> best_model")
                if es(metric, self.state):
                    self.log.info(
                        f"early stopping at epoch {epoch + 1} "
                        f"(no {metric_key} improvement for {es.patience} evals)"
                    )
                    self.state = es.restore_best(self.state)
                    break

            if (epoch + 1) % cfg.train.save_every_epochs == 0:
                ckpt_lib.try_save_checkpoint(
                    self.log, ckpt_dir, f"checkpoint_epoch_{epoch + 1}", self.state,
                    epoch, self.best_metric, self.history, cfg.to_dict(),
                )
            self.log.info(f"epoch {epoch + 1} done in {time.time() - t_epoch:.1f}s")

        ckpt_lib.save_checkpoint(
            ckpt_dir, "final_model", self.state,
            cfg.train.num_epochs - 1, self.best_metric, self.history, cfg.to_dict(),
        )
        with open(os.path.join(ckpt_dir, "history.json"), "w") as f:
            json.dump(self.history, f, indent=2)
        self.log.info(
            f"training finished in {(time.time() - t_start) / 3600:.2f}h; "
            f"best {cfg.train.early_stopping_metric}={self.best_metric}"
        )
        return self.history
