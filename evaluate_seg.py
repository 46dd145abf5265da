#!/usr/bin/env python
"""Segmentation evaluation CLI (reference: python train/evaluate.py).

  python evaluate_seg.py --checkpoint ckpts/best_model --source synthetic \\
      --batches 10 --save-plots --output-dir eval_out
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, help="checkpoint dir (e.g. ckpts/best_model)")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--source", choices=["synthetic", "files"], default="synthetic")
    parser.add_argument("--batches", type=int, default=10, help="synthetic eval batches")
    parser.add_argument("--output-dir", default="eval_out")
    parser.add_argument("--save-plots", action="store_true")
    parser.add_argument("--failure-threshold", type=float, default=0.5)
    parser.add_argument(
        "--worst-k", type=int, default=8,
        help="save the k lowest-IoU cases as panels even above the threshold",
    )
    args = parser.parse_args()

    import os

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()

    from mtg_card_image_segmentation_tpu.config import Config, default_config
    from mtg_card_image_segmentation_tpu.evaluation import SegEvaluator
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    cfg = Config.from_json(args.config) if args.config else default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)
    h, w = cfg.model.input_height, cfg.model.input_width
    batch = cfg.data.batch_size

    model = registry.from_config(cfg.model)
    # template-free params read — no init compile, no throwaway optimizer
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
    print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

    if args.source == "synthetic":
        import jax.numpy as jnp

        from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only
        from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch

        @jax.jit
        def make_batch(key):
            b = synthetic_batch(key, batch, h, w)
            return normalize_only(b.image), b.mask

        batches = [make_batch(jax.random.key(7_000_000 + i)) for i in range(args.batches)]
    else:
        from mtg_card_image_segmentation_tpu.data.dataset import CardSegmentationDataset
        from mtg_card_image_segmentation_tpu.data.pipeline import FilePipeline

        root = cfg.data.dataset_root
        ds = CardSegmentationDataset(
            os.path.join(root, cfg.data.test_split, "images"),
            os.path.join(root, cfg.data.test_split, "masks"),
        )
        batches = iter(
            FilePipeline(ds, batch, h, w, augment=None, shuffle=False, drop_last=False)
        )

    evaluator = SegEvaluator(
        model.apply, {"params": params, "batch_stats": batch_stats},
        cfg.model.num_classes,
    )
    report = evaluator.evaluate(
        batches,
        output_dir=args.output_dir,
        failure_iou_threshold=args.failure_threshold,
        save_plots=args.save_plots,
        worst_k=args.worst_k,
    )
    m = report["metrics"]
    print(json.dumps({k: round(v, 4) for k, v in m.items()}, indent=2))
    print("targets:", report["targets"])
    print(f"report -> {args.output_dir}/evaluation_report.json")


if __name__ == "__main__":
    main()
