#!/usr/bin/env python
"""Dataset generation CLI.

Replaces the reference's BlenderProc pipeline (dataset_generator/
03_generate_synthetic_dataset.py + synthetic_dataset_anti_leak.py):
renders the TPU-native synthetic scenes (data/synthetic.py) and
materializes them to disk in the reference's layout:

    dataset/{train,test}/{images/*.jpg, masks/*.png}
    dataset/corner_annotations.json

  python generate_dataset.py --train 8800 --test 2180 --height 320 --width 240
  python generate_dataset.py --watchdog --timeout-minutes 30 ...   # leak-tolerant wrapper
  python generate_dataset.py --download-references                  # Scryfall (network)
  python generate_dataset.py --download-backgrounds                 # Lorem Picsum (network)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _generate(args) -> None:
    import cv2
    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import numpy as np

    from mtg_card_image_segmentation_tpu.data.synthetic import (
        load_asset_bank,
        synthetic_batch,
    )

    assets = None
    if args.real_assets:
        assets = load_asset_bank(
            args.texture_dir or os.path.join(args.output, "references", "train"),
            args.background_dir or os.path.join(args.output, "backgrounds"),
            bg_hw=(args.height, args.width),
            hdri_dir=args.hdri_dir or os.path.join(args.output, "hdris"),
        )
        print(f"real-asset bank: {assets.textures.shape[0]} textures, "
              f"{assets.backgrounds.shape[0]} backgrounds, "
              f"{assets.hdris.shape[0]} HDRIs "
              "(dataset_generator/generate_synthetic.py:189-249,326-361 realism path)")

    counts = {"train": args.train, "test": args.test}
    annotations = {}
    batch = args.batch
    for split, total in counts.items():
        img_dir = os.path.join(args.output, split, "images")
        mask_dir = os.path.join(args.output, split, "masks")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        annotations[split] = {}
        seed_base = 0 if split == "train" else 1_000_000_007
        written = 0
        for start in range(0, total, batch):
            n = min(batch, total - start)
            # keep_in_frame: the written corner_annotations.json must obey
            # the reference contract (mask-derived => never off-screen)
            s = synthetic_batch(
                jax.random.key(seed_base + start), batch, args.height,
                args.width, 0.09, assets, args.real_prob, True,
            )
            imgs = np.asarray(
                (s.image * 255.0 + 0.5).astype("uint8")
            )
            masks = np.asarray(s.mask).astype(np.uint8) * 255
            corners = np.asarray(s.corners)
            has = np.asarray(s.has_card)
            for i in range(n):
                name = f"synthetic_{start + i:06d}"
                img_path = os.path.join(img_dir, name + ".jpg")
                if not os.path.exists(img_path):  # resume-skip
                    cv2.imwrite(img_path, cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR))
                    cv2.imwrite(os.path.join(mask_dir, name + ".png"), masks[i])
                if has[i]:
                    annotations[split][name + ".jpg"] = corners[i].tolist()
                written += 1
            if (start // batch) % 10 == 0:
                print(f"[{split}] {written}/{total}")
        print(f"[{split}] done: {written} images")
    with open(os.path.join(args.output, "corner_annotations.json"), "w") as f:
        json.dump(annotations, f)
    print(f"dataset -> {args.output}/ (+ corner_annotations.json)")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output", default="dataset")
    parser.add_argument("--train", type=int, default=8800)
    parser.add_argument("--test", type=int, default=2180)
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=240)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--derive-corners", action="store_true",
                        help="re-derive corners from masks (preprocess_masks parity) "
                             "instead of using the renderer's exact corners")
    parser.add_argument("--yolo-output", default=None,
                        help="also materialize the YOLO-pose layout here")
    parser.add_argument("--real-assets", action="store_true",
                        help="composite downloaded card scans / background "
                             "photos into the renders (realism parity with "
                             "the reference's Blender pipeline)")
    parser.add_argument("--texture-dir", default=None)
    parser.add_argument("--background-dir", default=None)
    parser.add_argument("--hdri-dir", default=None)
    parser.add_argument("--real-prob", type=float, default=0.7)
    parser.add_argument("--download-references", action="store_true")
    parser.add_argument("--download-backgrounds", action="store_true")
    parser.add_argument("--watchdog", action="store_true",
                        help="wrap generation in the anti-leak watchdog")
    parser.add_argument("--timeout-minutes", type=float, default=30.0)
    args = parser.parse_args()

    if args.watchdog:
        from mtg_card_image_segmentation_tpu.datagen.watchdog import run_with_watchdog

        cmd = [sys.executable, os.path.abspath(__file__)] + [
            a for a in sys.argv[1:] if a != "--watchdog"
        ]
        raise SystemExit(run_with_watchdog(cmd, args.timeout_minutes))

    if args.download_references:
        from mtg_card_image_segmentation_tpu.datagen.downloaders import (
            ScryfallDownloader,
        )

        print(ScryfallDownloader(os.path.join(args.output, "references")).download())
        return
    if args.download_backgrounds:
        from mtg_card_image_segmentation_tpu.datagen.downloaders import (
            BackgroundDownloader,
        )

        print(BackgroundDownloader(args.output).download())
        return

    _generate(args)

    if args.derive_corners:
        from mtg_card_image_segmentation_tpu.data.corners import process_dataset

        process_dataset(args.output)
        print("corner_annotations.json re-derived from masks")
    if args.yolo_output:
        from mtg_card_image_segmentation_tpu.data.corners import (
            create_yolo_annotations,
        )

        yaml_path = create_yolo_annotations(args.output, args.yolo_output)
        print(f"YOLO layout -> {args.yolo_output} ({yaml_path})")


if __name__ == "__main__":
    main()
