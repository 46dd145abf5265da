#!/usr/bin/env python
"""Segmentation inference CLI — run a trained checkpoint OR a shipped
deployment artifact on images and report mask stats
(reference: the generated deployment package's inference_example.py,
train/export.py:282-476, and the dual-backend pattern of
train-pose-estimation_custom/inference_test.py:64-139).

  python seg_inference.py --checkpoint runs/seg_full/checkpoints/best_model --synthetic 2
  python seg_inference.py --onnx runs/seg_full/exported --synthetic 2
  python seg_inference.py --onnx runs/seg_full/exported/model_fp16.onnx --image card.jpg
  python seg_inference.py --stablehlo runs/seg_full/exported --synthetic 1 --visualize

--onnx PATH executes through the in-repo dependency-free ONNX executor; a
package DIRECTORY walks the int8 -> fp16 -> fp32 fallback ladder.
--stablehlo PATH executes the jax.export artifact. Output per sample: card
pixel fraction, mean card confidence, inference time; --visualize writes
the reference demo's cyan-overlay rendering (demo/src/image-utils.js
:190-227 behavior) as PNG.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--onnx", default=None, metavar="PATH")
    parser.add_argument("--stablehlo", default=None, metavar="PATH")
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--output-dir", default="seg_inference_out")
    parser.add_argument("--visualize", action="store_true")
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import default_config
    from mtg_card_image_segmentation_tpu.data.preprocess import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize

    cfg = default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)
    h, w = cfg.model.input_height, cfg.model.input_width

    chosen = [n for n, v in (("--checkpoint", args.checkpoint),
                             ("--onnx", args.onnx),
                             ("--stablehlo", args.stablehlo)) if v]
    if len(chosen) != 1:
        parser.error("give exactly one of --checkpoint / --onnx / --stablehlo")

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    if args.onnx or args.stablehlo:
        from mtg_card_image_segmentation_tpu.serving import artifact_backend

        if args.onnx:
            runner, chosen_path = artifact_backend.load_onnx(args.onnx, "seg")
        else:
            runner, chosen_path = artifact_backend.load_stablehlo(
                args.stablehlo, "seg"
            )
        print(f"loaded artifact {chosen_path}")

        # exported IO contract (runs/*/exported/model_info.json): input
        # (1, 3, H, W) fp32 ImageNet-normalized NCHW; output NCHW logits
        _prep = jax.jit(
            lambda im: jnp.transpose(
                (bilinear_resize(im, h, w) - mean) / std, (0, 3, 1, 2)
            )
        )

        def infer(images01):
            logits = runner(np.asarray(_prep(images01)))  # (B, C, H, W)
            return np.transpose(logits, (0, 2, 3, 1))

    else:
        from mtg_card_image_segmentation_tpu.models import registry
        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
        params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
        model = registry.from_config(cfg.model)
        print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

        @jax.jit
        def _infer(variables, images01):
            x = (bilinear_resize(images01, h, w) - mean) / std
            return model.apply(variables, x, train=False)

        variables = {"params": params, "batch_stats": batch_stats}

        def infer(images01):
            return np.asarray(_infer(variables, images01))

    samples = []  # (name, (H0, W0, 3) float01 numpy)
    if args.image:
        import cv2

        raw = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        samples.append((os.path.basename(args.image), raw.astype(np.float32) / 255.0))
    for i in range(args.synthetic):
        from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_sample

        s = synthetic_sample(jax.random.key(321 + i), h, w, 0.0)
        samples.append((f"synthetic_{i}", np.asarray(s.image)))
    if not samples:
        parser.error("give --image or --synthetic N")

    os.makedirs(args.output_dir, exist_ok=True)
    results = []
    for sample_name, img in samples:
        t0 = time.perf_counter()
        logits = infer(np.asarray(img, np.float32)[None])  # (1, H, W, C)
        dt_ms = (time.perf_counter() - t0) * 1e3
        prob = np.exp(logits - logits.max(-1, keepdims=True))
        prob /= prob.sum(-1, keepdims=True)
        mask = logits.argmax(-1)[0]  # (H, W), 1 = card
        res = {
            "sample": sample_name,
            "card_pixel_fraction": float((mask == 1).mean()),
            "mean_card_confidence": float(prob[0, ..., 1][mask == 1].mean())
            if (mask == 1).any() else 0.0,
            "inference_ms": round(dt_ms, 2),
        }
        results.append(res)
        print(json.dumps(res))

        if args.visualize:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            disp = np.asarray(
                bilinear_resize(jnp.asarray(img, jnp.float32)[None], h, w)
            )[0]
            # cyan overlay, alpha 128 — the demo's rendering
            overlay = disp.copy()
            overlay[mask == 1] = 0.5 * overlay[mask == 1] + 0.5 * np.array(
                [0.0, 1.0, 1.0]
            )
            fig, axes = plt.subplots(1, 2, figsize=(8, 5))
            axes[0].imshow(disp)
            axes[0].set_title(sample_name)
            axes[1].imshow(overlay)
            axes[1].set_title(f"card {res['card_pixel_fraction'] * 100:.1f}%")
            for ax in axes:
                ax.axis("off")
            out = os.path.join(args.output_dir, f"{sample_name}_mask.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            print(f"  visualization -> {out}")

    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
