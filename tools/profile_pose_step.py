#!/usr/bin/env python
"""Profile the pose training step: datagen vs train-step cost at several
batch sizes, on the real chip. Run: python tools/profile_pose_step.py"""

import time

import jax
import numpy as np

from mtg_card_image_segmentation_tpu.config import pose_default_config
from mtg_card_image_segmentation_tpu.data.pipeline import PoseSyntheticPipeline
from mtg_card_image_segmentation_tpu.models import registry
from mtg_card_image_segmentation_tpu.training.loop import make_pose_train_step
from mtg_card_image_segmentation_tpu.training.state import create_seg_state
import optax


def bench(fn, n=20):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = pose_default_config()
    h, w = cfg.pose.input_height, cfg.pose.input_width
    hh, hw = cfg.pose.heatmap_height, cfg.pose.heatmap_width

    for batch in (24, 48, 96):
        pipe = PoseSyntheticPipeline(
            batch, h, w, hh, hw, sigma=2.0, mesh=None,
            augment=cfg.data.augment, seed=0,
        )
        it = iter(pipe)

        def gen():
            return next(it)[0]

        t_gen = bench(gen, n=10)

        model = registry.pose_from_config(cfg.pose)
        tx = optax.adamw(1e-3)
        state = create_seg_state(model, tx, (1, h, w, 3), jax.random.key(0))
        step = make_pose_train_step(mesh=None, donate=False)
        images, targets, _ = next(it)
        state_box = [state]

        def train():
            state_box[0], stats = step(state_box[0], images, targets)
            return stats["loss"]

        t_step = bench(train, n=10)
        print(f"batch {batch:3d}: datagen {t_gen*1e3:7.1f} ms  "
              f"train_step {t_step*1e3:7.1f} ms  "
              f"-> {batch / (t_gen + t_step):7.1f} img/s combined")


if __name__ == "__main__":
    main()
