#!/usr/bin/env python
"""Corner-accuracy evaluation CLI for both pose families
(reference: python train-pose-estimation_yolo12n/evaluate_model.py and the
custom pipeline's CornerMetrics reporting).

Runs the model over held-out synthetic batches (fixed seeds, disjoint from
training) and emits the reference's report schema — accuracy@{3,5,6,10,20}px,
per-corner stats, detection rate, mean/median/std error, quality tiers
(*_yolo12n/README.md:163-171) — as pose_evaluation.json + report.txt +
error_distribution.png.

  python evaluate_pose.py --family hrnet --checkpoint runs/pose_full/checkpoints/best_model
  python evaluate_pose.py --family yolo  --checkpoint runs/yolo_full/checkpoints/best_model --imgsz 640
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", choices=["hrnet", "yolo"], required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--imgsz", type=int, default=640, help="yolo square input")
    parser.add_argument("--batches", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=24)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument(
        "--worst-k", type=int, default=8,
        help="save the k highest-error cases as GT-vs-pred corner panels",
    )
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import pose_default_config
    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch
    from mtg_card_image_segmentation_tpu.evaluation import (
        CornerEvaluator,
        PoseEvaluator,
    )
    from mtg_card_image_segmentation_tpu.models import create_model, registry
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    cfg = pose_default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)
    out_dir = args.output_dir or f"runs/eval_{args.family}"

    if args.family == "hrnet":
        h, w = cfg.pose.input_height, cfg.pose.input_width
        model = registry.pose_from_config(cfg.pose)
    else:
        h = w = args.imgsz
        model = create_model("yolo12n_pose")

    # template-free params read — no init compile, no throwaway optimizer
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
    print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

    # held-out synthetic stream: seeds disjoint from training (training uses
    # sequential splits of key(seed); evaluation uses keys 5_000_000+)
    def batches():
        for i in range(args.batches):
            s = synthetic_batch(
                jax.random.key(5_000_000 + i), args.batch_size, h, w, 0.0,
                keep_in_frame=True,
            )
            yield s.image, s.corners

    variables = {"params": params, "batch_stats": batch_stats}
    if args.family == "hrnet":
        evaluator = PoseEvaluator(model.apply, variables, (h, w))
    else:
        evaluator = CornerEvaluator(model.apply, variables, (h, w))

    report = evaluator.evaluate(
        batches(), output_dir=out_dir, worst_k=args.worst_k
    )
    print(json.dumps({k: v for k, v in report.items() if k != "per_corner"}, indent=2))
    print(f"report -> {out_dir}/pose_evaluation.json")


if __name__ == "__main__":
    main()
