#!/usr/bin/env python
"""Corner-keypoint (heatmap) training CLI
(reference entry point: python train-pose-estimation_custom/train.py).

Examples:
  python train_pose.py --set train.num_epochs=5           # synthetic source
  python train_pose.py --resume
"""

from __future__ import annotations

import argparse

import jax


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--resume", nargs="?", const="__latest__", default=None)
    args = parser.parse_args()

    from mtg_card_image_segmentation_tpu.config import Config, pose_default_config
    from mtg_card_image_segmentation_tpu.data.pipeline import PoseSyntheticPipeline
    from mtg_card_image_segmentation_tpu.parallel import distributed
    from mtg_card_image_segmentation_tpu.training.pose_trainer import PoseTrainer

    # multi-host: no-op unless JAX_COORDINATOR/NPROC/PROC_ID are set
    distributed.initialize()

    cfg = Config.from_json(args.config) if args.config else pose_default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)

    trainer = PoseTrainer(cfg)
    mesh = trainer.mesh
    h, w = cfg.pose.input_height, cfg.pose.input_width
    hh, hw = cfg.pose.heatmap_height, cfg.pose.heatmap_width
    batch = cfg.data.batch_size

    train_iter = iter(
        PoseSyntheticPipeline(
            batch, h, w, hh, hw, sigma=cfg.pose.gaussian_sigma, mesh=mesh,
            augment=cfg.data.augment, seed=cfg.train.seed,
        )
    )
    # validation: clean (un-augmented) synthetic stream with fixed seeds
    val_pipe = PoseSyntheticPipeline(
        batch, h, w, hh, hw, sigma=cfg.pose.gaussian_sigma, mesh=mesh,
        augment=None, seed=99_999,
    )

    def make_val_batches(n: int = 6):
        import itertools

        return list(itertools.islice(iter(val_pipe), n))

    def make_recal_batches(n: int = 4):
        import itertools

        return [b[0] for b in itertools.islice(iter(val_pipe), n)]

    if args.resume is not None:
        trainer.resume(None if args.resume == "__latest__" else args.resume)

    trainer.train(train_iter, make_val_batches, make_recal_batches)


if __name__ == "__main__":
    main()
