#!/usr/bin/env python
"""Augmentation visualizer
(reference: train-pose-estimation_custom/visualize_augmentations.py).

Renders grids of augmented samples — images, masks, and keypoint overlays —
for eyeballing the on-device augmentation suite.

  python visualize_augmentations.py --samples 4 --variants 5 --out aug_grid.png
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--samples", type=int, default=4)
    parser.add_argument("--variants", type=int, default=5)
    parser.add_argument("--height", type=int, default=160)
    parser.add_argument("--width", type=int, default=120)
    parser.add_argument("--keypoints", action="store_true",
                        help="keypoint-aware pipeline (affine only) with corner overlay")
    parser.add_argument("--out", default="augmentation_grid.png")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import matplotlib.pyplot as plt
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import AugmentConfig
    from mtg_card_image_segmentation_tpu.data.augment import augment_sample
    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_sample

    cfg = AugmentConfig()
    rows = args.samples
    cols = args.variants + 1
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.8 * rows),
                             squeeze=False)
    for r in range(rows):
        s = synthetic_sample(jax.random.key(args.seed + r), args.height, args.width, 0.0)
        axes[r][0].imshow(np.asarray(s.image))
        axes[r][0].set_title("original", fontsize=8)
        for c in range(1, cols):
            key = jax.random.key(1000 * (r + 1) + c)
            kpts = s.corners if args.keypoints else None
            out = augment_sample(
                key, s.image, s.mask, cfg,
                keypoints=kpts, flip_idx=(1, 0, 3, 2) if args.keypoints else None,
            )
            img = np.asarray(out.image)
            axes[r][c].imshow(img)
            # mask contour overlay
            m = np.asarray(out.mask)
            axes[r][c].contour(m, levels=[0.5], colors="cyan", linewidths=1)
            if args.keypoints and out.keypoints is not None:
                k = np.asarray(out.keypoints)
                axes[r][c].scatter(k[:, 0], k[:, 1], c=["r", "lime", "b", "y"], s=14)
            axes[r][c].set_title(f"aug {c}", fontsize=8)
        for ax in axes[r]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"augmentation grid -> {args.out}")


if __name__ == "__main__":
    main()
