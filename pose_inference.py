#!/usr/bin/env python
"""Corner-detection inference CLI
(reference: train-pose-estimation_custom/inference_test.py — dual backend
.pth/.onnx with session fallback ladder :64-139, preprocess, peak
extraction w/ threshold, scale-to-original, visualization, timing).

  python pose_inference.py --checkpoint ckpts/best_model --image card.jpg
  python pose_inference.py --checkpoint ckpts/best_model --synthetic 4
  python pose_inference.py --checkpoint runs/yolo/checkpoints/best_model \
      --family yolo --synthetic 4
  python pose_inference.py --onnx runs/pose_full/exported --synthetic 2
  python pose_inference.py --stablehlo runs/yolo_full_r4/exported \
      --family yolo --synthetic 2

--family yolo runs the same CLI against a YOLO12n-pose checkpoint (the
reference splits this across inference_test.py and the ultralytics
predict flow, *_yolo12n/model.py:215-264; here one CLI serves both).

--onnx PATH executes a shipped ONNX artifact through the in-repo
dependency-free executor instead of the checkpoint; a package DIRECTORY
walks the int8 -> fp16 -> fp32 fallback ladder (the reference's fp16
session ladder, inference_test.py:102-129). --stablehlo PATH executes the
jax.export artifact. Both exist so a consumer can smoke-run every shipped
deployment artifact from disk.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--onnx", default=None, metavar="PATH",
                        help="run a shipped .onnx artifact (or walk a package "
                             "directory's int8->fp16->fp32 ladder) instead of "
                             "a checkpoint")
    parser.add_argument("--stablehlo", default=None, metavar="PATH",
                        help="run a shipped .stablehlo artifact (or the one "
                             "inside a package directory)")
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

    chosen = [n for n, v in (("--checkpoint", args.checkpoint),
                             ("--onnx", args.onnx),
                             ("--stablehlo", args.stablehlo)) if v]
    if len(chosen) != 1:
        parser.error("give exactly one of --checkpoint / --onnx / --stablehlo")

    if args.onnx or args.stablehlo:
        from mtg_card_image_segmentation_tpu.serving import artifact_backend

        if args.onnx:
            runner, chosen_path = artifact_backend.load_onnx(args.onnx, args.family)
        else:
            runner, chosen_path = artifact_backend.load_stablehlo(
                args.stablehlo, args.family
            )
        print(f"loaded artifact {chosen_path} ({args.family})")
        variables = None

        if args.family == "hrnet":
            h, w = cfg.pose.input_height, cfg.pose.input_width
        else:
            h = w = args.imgsz
        # one jitted preprocess (eager per-op dispatch is pathologically
        # slow on the remote-compile TPU relay)
        _prep = jax.jit(
            lambda im: jnp.transpose(bilinear_resize(im, h, w), (0, 3, 1, 2))
        )

        if args.family == "hrnet":
            decode = jax.jit(hm_lib.decode_argmax_subpixel_gated)

            def infer(_, images01):
                heatmaps = np.transpose(
                    runner(np.asarray(_prep(images01))), (0, 2, 3, 1)
                )  # NHWK
                coords01, conf = decode(heatmaps)
                return coords01, conf, heatmaps

        else:
            from mtg_card_image_segmentation_tpu.export.yolo_client_decode import (
                decode as client_decode,
            )

            def infer(_, images01):
                h0, w0 = images01.shape[1:3]
                _, _, kp = client_decode(
                    runner(np.asarray(_prep(images01))), num_keypoints=4
                )
                # map back with the (size-1) convention, then to coords01
                px0 = kp[:, :2] * np.asarray(
                    [(w0 - 1) / (w - 1), (h0 - 1) / (h - 1)]
                )
                coords01 = px0 / np.asarray([w0 - 1.0, h0 - 1.0])
                return coords01[None], kp[None, :, 2], None

    elif args.family == "yolo":
        ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
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
        ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
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
