#!/usr/bin/env python
"""Segmentation training CLI (reference entry point: python train/train.py).

Examples:
  # train on the on-device synthetic stream (no dataset on disk needed)
  python train_seg.py --source synthetic --set train.num_epochs=5

  # train on a disk dataset with the reference layout
  python train_seg.py --source files --set data.dataset_root=./dataset

  # resume
  python train_seg.py --resume
"""

from __future__ import annotations

import argparse
import itertools

import jax

# NOTE: do not enable jax_compilation_cache_dir here — on the remote-compile
# TPU relay used in this environment it serializes >100MB of cache artifacts
# per run and makes cold start slower, not faster (measured).


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None, help="JSON config file")
    parser.add_argument(
        "--set", nargs="*", default=[], metavar="a.b=v", help="config overrides"
    )
    parser.add_argument("--source", choices=["synthetic", "files"], default="synthetic")
    parser.add_argument("--resume", nargs="?", const="__latest__", default=None)
    parser.add_argument("--plot", action="store_true", help="write history plot")
    args = parser.parse_args()

    from mtg_card_image_segmentation_tpu.config import Config, default_config
    from mtg_card_image_segmentation_tpu.parallel import distributed
    from mtg_card_image_segmentation_tpu.training.trainer import SegTrainer

    # multi-host: no-op unless JAX_COORDINATOR/NPROC/PROC_ID are set
    distributed.initialize()

    cfg = Config.from_json(args.config) if args.config else default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)

    trainer = SegTrainer(cfg)
    mesh = trainer.mesh
    h, w = cfg.model.input_height, cfg.model.input_width
    batch = cfg.data.batch_size

    if args.source == "synthetic":
        from mtg_card_image_segmentation_tpu.data.pipeline import SyntheticPipeline
        from mtg_card_image_segmentation_tpu.data.synthetic import (
            load_asset_bank,
            synthetic_batch,
        )
        from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only

        assets = None
        if cfg.data.texture_dir or cfg.data.background_dir or cfg.data.hdri_dir:
            assets = load_asset_bank(
                cfg.data.texture_dir or None, cfg.data.background_dir or None,
                bg_hw=(h, w), hdri_dir=cfg.data.hdri_dir or None,
            )
            print(f"asset bank: {assets.textures.shape[0]} textures, "
                  f"{assets.backgrounds.shape[0]} backgrounds, "
                  f"{assets.hdris.shape[0]} HDRIs")

        train_iter = iter(
            SyntheticPipeline(
                batch, h, w, mesh=mesh, augment=cfg.data.augment,
                seed=cfg.train.seed,
                assets=assets, real_prob=cfg.data.real_asset_prob,
            )
        )

        nproc = distributed.process_count()
        val_lb = distributed.local_batch_size(batch)

        @jax.jit
        def _val_batch_local(key):
            # validation stream mixes real-texture samples too when a bank is
            # configured, so eval covers the real-asset domain
            b = synthetic_batch(
                key, val_lb, h, w, 0.09, assets, cfg.data.real_asset_prob
            )
            return normalize_only(b.image), b.mask

        def _val_batch(key):
            if nproc == 1:
                return _val_batch_local(key)
            # multi-host: each process renders its 1/nproc slice (distinct
            # key) and the slices assemble into one global-mesh batch —
            # feeding process-local full batches to the globally-sharded
            # eval_step would be rejected (incompatible devices)
            import numpy as np

            imgs, msks = _val_batch_local(
                jax.random.fold_in(key, distributed.process_index())
            )
            return distributed.global_batch(mesh, np.asarray(imgs), np.asarray(msks))

        def make_val_batches(n: int = 8, seed: int = 10_000):
            return [_val_batch(jax.random.key(seed + i)) for i in range(n)]

        def make_recal_batches(n: int = 6, seed: int = 20_000):
            return [_val_batch(jax.random.key(seed + i))[0] for i in range(n)]

    else:
        import os

        from mtg_card_image_segmentation_tpu.data.dataset import (
            CardSegmentationDataset,
        )
        from mtg_card_image_segmentation_tpu.data.pipeline import FilePipeline

        root = cfg.data.dataset_root
        train_ds = CardSegmentationDataset(
            os.path.join(root, cfg.data.train_split, "images"),
            os.path.join(root, cfg.data.train_split, "masks"),
        )
        test_ds = CardSegmentationDataset(
            os.path.join(root, cfg.data.test_split, "images"),
            os.path.join(root, cfg.data.test_split, "masks"),
        )
        train_pipe = FilePipeline(
            train_ds, batch, h, w, mesh=mesh, augment=cfg.data.augment,
            shuffle=True, seed=cfg.train.seed,
        )
        if cfg.train.steps_per_epoch is None:
            object.__setattr__  # (frozen dataclass) steps derived below
            trainer.steps_per_epoch = train_pipe.steps_per_epoch

        def _forever(pipe):
            while True:
                for imgs, msks, _valid in iter(pipe):
                    yield imgs, msks  # drop_last=True: always full batches

        train_iter = _forever(train_pipe)

        def make_val_batches():
            # multi-host FilePipeline is a drop_last path (per-process
            # padded-tail accounting is not supported); single-process
            # keeps the padded final batch + valid-weighted metrics
            return iter(
                FilePipeline(
                    test_ds, batch, h, w, mesh=mesh, augment=None,
                    shuffle=False,
                    drop_last=distributed.process_count() > 1,
                )
            )

        def make_recal_batches(n: int = 6):
            pipe = FilePipeline(
                train_ds, batch, h, w, mesh=mesh, augment=None, shuffle=True,
            )
            return [imgs for imgs, *_ in itertools.islice(iter(pipe), n)]

    if args.resume is not None:
        trainer.resume(None if args.resume == "__latest__" else args.resume)

    history = trainer.train(train_iter, make_val_batches, make_recal_batches)

    if args.plot:
        from mtg_card_image_segmentation_tpu.utils.plots import plot_training_history
        import os

        out = plot_training_history(
            history, os.path.join(cfg.train.log_dir, "training_history.png")
        )
        print(f"history plot -> {out}")


if __name__ == "__main__":
    main()
