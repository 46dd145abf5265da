#!/usr/bin/env python
"""Example/analysis plot generator
(reference: train-pose-estimation_yolo12n/generate_examples.py —
annotation visualizations, dataset statistics, prediction grids).

  python generate_examples.py --out examples_out --samples 8
  python generate_examples.py --out examples_out --checkpoint ckpts/best_model
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="examples_out")
    parser.add_argument("--samples", type=int, default=8)
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=240)
    parser.add_argument("--checkpoint", default=None,
                        help="seg checkpoint for a prediction grid")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch

    os.makedirs(args.out, exist_ok=True)
    batch = synthetic_batch(
        jax.random.key(args.seed), args.samples, args.height, args.width
    )
    imgs = np.asarray(batch.image)
    masks = np.asarray(batch.mask)
    corners = np.asarray(batch.corners)
    has = np.asarray(batch.has_card)

    # 1) annotation grid: image + mask contour + corners
    cols = min(4, args.samples)
    rows = -(-args.samples // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 4 * rows), squeeze=False)
    for i in range(args.samples):
        ax = axes[i // cols][i % cols]
        ax.imshow(imgs[i])
        ax.contour(masks[i], levels=[0.5], colors="cyan", linewidths=1)
        if has[i]:
            c = corners[i]
            ax.scatter(c[:, 0], c[:, 1], c=["r", "lime", "b", "y"], s=20)
            for k, name in enumerate(["TL", "TR", "BR", "BL"]):
                ax.annotate(name, c[k], color="w", fontsize=7)
        ax.set_title("card" if has[i] else "negative", fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "annotations.png"), dpi=120)
    plt.close(fig)

    # 2) dataset statistics over a larger sample
    stats_batch = synthetic_batch(jax.random.key(args.seed + 1), 256, 96, 72)
    m = np.asarray(stats_batch.mask)
    fractions = m.mean(axis=(1, 2))
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(fractions, bins=30)
    axes[0].set_title("card area fraction (256 samples)")
    axes[1].bar(["card", "negative"],
                [int(np.asarray(stats_batch.has_card).sum()),
                 int((~np.asarray(stats_batch.has_card)).sum())])
    axes[1].set_title("sample composition")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "dataset_stats.png"), dpi=120)
    plt.close(fig)

    # 3) optional prediction grid from a checkpoint
    if args.checkpoint:
        from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only
        from mtg_card_image_segmentation_tpu.models import create_model
        from mtg_card_image_segmentation_tpu.training import (
            checkpoint as ckpt_lib,
        )
        from mtg_card_image_segmentation_tpu.utils.plots import plot_predictions

        model = create_model("lraspp_mobilenet_v3_large")
        ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
        params, batch_stats, _ = ckpt_lib.load_params(ckpt_dir or ".", name)
        logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": params, "batch_stats": batch_stats},
            normalize_only(batch.image),
        )
        preds = np.asarray(jnp.argmax(logits, -1))
        conf = np.asarray(jax.nn.softmax(logits, -1)[..., 1])
        plot_predictions(
            imgs, masks, preds,
            os.path.join(args.out, "predictions.png"), max_samples=4,
            confidences=conf,
        )
    print(f"examples -> {args.out}/")


if __name__ == "__main__":
    main()
