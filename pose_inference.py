#!/usr/bin/env python
"""Corner-detection inference CLI
(reference: train-pose-estimation_custom/inference_test.py — preprocess,
peak extraction w/ threshold, scale-to-original, visualization, timing).

  python pose_inference.py --checkpoint ckpts/best_model --image card.jpg
  python pose_inference.py --checkpoint ckpts/best_model --synthetic 4
  python pose_inference.py --checkpoint runs/yolo/checkpoints/best_model \
      --family yolo --synthetic 4

--family yolo runs the same CLI against a YOLO12n-pose checkpoint (the
reference splits this across inference_test.py and the ultralytics
predict flow, *_yolo12n/model.py:215-264; here one CLI serves both).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--image", type=str, default=None, help="image file to run on")
    parser.add_argument("--synthetic", type=int, default=0, help="run on N synthetic samples")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--threshold", type=float, default=0.3)
    parser.add_argument("--family", choices=["hrnet", "yolo"], default="hrnet",
                        help="corner model family the checkpoint holds")
    parser.add_argument("--imgsz", type=int, default=640,
                        help="square YOLO input size (--family yolo)")
    parser.add_argument("--output-dir", default="pose_inference_out")
    parser.add_argument("--visualize", action="store_true")
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import Config, pose_default_config
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib
    from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    cfg = Config.from_json(args.config) if args.config else pose_default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)

    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    if args.family == "yolo":
        if args.config or args.set:
            parser.error("--family yolo is configured by --imgsz/--threshold "
                         "only; --config/--set apply to the hrnet family")
        from mtg_card_image_segmentation_tpu.serving import YoloCornerPredictor

        h = w = args.imgsz
        predictor = YoloCornerPredictor.from_checkpoint(
            ckpt_dir or ".", name, imgsz=args.imgsz, threshold=args.threshold
        )
        print(f"loaded {args.checkpoint} (yolo12n_pose, imgsz={args.imgsz})")
        variables = None

        @jax.jit
        def _to_u8(images01):
            # stretch-resize to the square YOLO input (ultralytics imgsz
            # semantics) and requantize for the predictor's uint8 contract
            x = bilinear_resize(images01, h, w)
            return jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        def infer(_, images01):
            # map back to the ORIGINAL frame with the YOLO half-pixel
            # convention, then to the loop's coords01 (size-1) contract
            h0, w0 = images01.shape[1:3]
            px, conf = predictor.predict(_to_u8(images01))
            px0 = predictor.scale_to_original(px, (h0, w0))
            return px0 / jnp.array([w0 - 1.0, h0 - 1.0]), conf, None

    else:
        model = registry.pose_from_config(cfg.pose)
        h, w = cfg.pose.input_height, cfg.pose.input_width
        # template-free params read — no init compile, no optimizer state
        params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
        variables = {"params": params, "batch_stats": batch_stats}
        print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

        @jax.jit
        def infer(variables, images01):
            """Preprocess = resize + /255-style [0,1] input (NO ImageNet norm —
            inference_test.py:167-169), forward, peak-extract."""
            x = bilinear_resize(images01, h, w)
            heatmaps = model.apply(variables, x, train=False)
            # sub-pixel decode with gated joint-NMS fallback — same as
            # eval/serving and the exported model's documented recipe
            coords01, conf = hm_lib.decode_argmax_subpixel_gated(heatmaps)
            return coords01, conf, heatmaps

    samples = []  # (name, (H0, W0, 3) float01 numpy)
    if args.image:
        import cv2

        raw = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        samples.append((os.path.basename(args.image), raw.astype(np.float32) / 255.0))
    for i in range(args.synthetic):
        from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_sample

        s = synthetic_sample(jax.random.key(123 + i), h, w, 0.0)
        samples.append((f"synthetic_{i}", np.asarray(s.image)))
    if not samples:
        parser.error("give --image or --synthetic N")

    os.makedirs(args.output_dir, exist_ok=True)
    results = []
    for sample_name, img in samples:
        t0 = time.perf_counter()
        coords01, conf, _ = infer(variables, jnp.asarray(img)[None])
        coords01 = np.asarray(coords01)[0]  # fences the computation
        conf = np.asarray(conf)[0]
        dt_ms = (time.perf_counter() - t0) * 1e3
        h0, w0 = img.shape[:2]
        px = coords01 * np.array([w0 - 1, h0 - 1])  # scale to original size
        valid = conf >= args.threshold
        res = {
            "sample": sample_name,
            "corners_xy": px.round(2).tolist(),
            "confidences": conf.round(3).tolist(),
            "valid": valid.tolist(),
            "inference_ms": round(dt_ms, 2),
        }
        results.append(res)
        print(json.dumps(res))

        if args.visualize:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            ax.imshow(img)
            colors = ["red", "lime", "blue", "yellow"]
            for k in range(4):
                marker = "o" if valid[k] else "x"
                ax.scatter(*px[k], c=colors[k], s=80, marker=marker)
                ax.annotate(f"{conf[k]:.2f}", px[k], color=colors[k], fontsize=8)
            poly = np.vstack([px[valid], px[valid][:1]]) if valid.sum() >= 3 else None
            if poly is not None:
                ax.plot(poly[:, 0], poly[:, 1], "c--", alpha=0.7)
            ax.axis("off")
            out = os.path.join(args.output_dir, f"{sample_name}_corners.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            print(f"  visualization -> {out}")

    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
