#!/usr/bin/env python
"""Cache raw model outputs of the decode-tail eval images as small tracked
test fixtures (VERDICT r4 task 2).

Round 3/4 decode regressions (HRNet dead-channel 413 px, YOLO bf16 NMS flip
323 px) each cost a ~2 h retrain plus manual eval inspection to discover.
This tool freezes the raw pre-decode arrays of exactly those images — plus
a few well-formed ones — so tests/test_decode_fixtures.py can assert the
shipped decodes stay under the round-5 error bounds in milliseconds:

- hrnet: the eval image with the weakest corner channel (the dead-channel
  tail: global channel max ~0.002) + the 3 highest-error remaining images.
  Stored per image: (H, W, K) float16 heatmaps + GT corner pixels.
- yolo: the eval image where the UNGATED joint decode (pre-round-5 scoring,
  no plausibility term) errs worst — on the bf16 TPU serving path this is
  the 323 px flip image — + the 3 worst images under the shipped decode.
  Stored per image: decoded (A, 4) boxes / (A, 1) scores / (A, K, 3) kpts
  in float16 + GT corner pixels.

Run on the TPU serving path (the platform whose numerics the artifacts
track); the driver queue invokes it after each retrain.

Usage:
  python tools/make_decode_fixtures.py --family hrnet --checkpoint runs/pose_full/checkpoints/best_model
  python tools/make_decode_fixtures.py --family yolo  --checkpoint runs/yolo_full_r4/checkpoints/best_model
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_batches(h, w, batches=16, batch_size=24):
    """The held-out eval stream — same keys as evaluate_pose.py."""
    import jax

    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch

    for i in range(batches):
        s = synthetic_batch(
            jax.random.key(5_000_000 + i), batch_size, h, w, 0.0,
            keep_in_frame=True,
        )
        yield s.image, s.corners


def ungated_top1(boxes, scores, kpts):
    """The pre-round-5 joint decode scoring (conf - collision penalty, no
    plausibility gate) — used only to FIND the flip image; the shipped
    decode lives in models/yolo12_pose.py."""
    import jax.numpy as jnp

    from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
        KPT_COLLISION_PX,
    )
    from mtg_card_image_segmentation_tpu.ops.heatmap import canonicalize_corners

    k_dim = kpts.shape[2]
    n_cand = 3
    flat = jnp.swapaxes(kpts, 1, 2)
    xy = flat[..., :2]
    masked = flat[..., 2].astype(jnp.float32)
    picks = []
    for _ in range(n_cand):
        i = jnp.argmax(masked, axis=-1)
        picks.append(i)
        sel = jnp.take_along_axis(xy, i[..., None, None], axis=2)
        d2_a = jnp.sum((xy - sel) ** 2, axis=-1)
        masked = jnp.where(d2_a < KPT_COLLISION_PX**2, -jnp.inf, masked)
    i3 = jnp.stack(picks, axis=-1)
    cand = jnp.take_along_axis(flat, i3[..., None], axis=2)
    c3 = cand[..., 2]
    digits = []
    for c in range(n_cand**k_dim):
        q, row = c, []
        for _ in range(k_dim):
            row.append(q % n_cand)
            q //= n_cand
        digits.append(row)
    combos = jnp.asarray(digits)
    pick = cand[:, jnp.arange(k_dim)[None, :], combos, :]
    conf_sum = jnp.sum(c3[:, jnp.arange(k_dim)[None, :], combos], axis=-1)
    d2 = jnp.sum((pick[..., None, :, :2] - pick[..., :, None, :2]) ** 2, axis=-1)
    eye = jnp.eye(k_dim, dtype=bool)
    collide = (d2 < KPT_COLLISION_PX**2) & ~eye
    penalty = jnp.sum(collide, axis=(-1, -2)).astype(jnp.float32) * 10.0
    best = jnp.argmax(conf_sum.astype(jnp.float32) - penalty, axis=1)
    kp = jnp.take_along_axis(pick, best[:, None, None, None], axis=1)[:, 0]
    return canonicalize_corners(kp)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", choices=["hrnet", "yolo"], required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", default="tests/fixtures")
    parser.add_argument("--imgsz", type=int, default=640)
    args = parser.parse_args()

    import jax
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import pose_default_config
    from mtg_card_image_segmentation_tpu.models import create_model, registry
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    cfg = pose_default_config()
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
    variables = {"params": params, "batch_stats": batch_stats}
    os.makedirs(args.out, exist_ok=True)
    platform = jax.devices()[0].platform

    if args.family == "hrnet":
        h, w = cfg.pose.input_height, cfg.pose.input_width
        model = registry.pose_from_config(cfg.pose)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        hms, gts = [], []
        for images, corners in eval_batches(h, w):
            hms.append(np.asarray(fwd(variables, images), np.float32))
            gts.append(np.asarray(corners))
        hm = np.concatenate(hms)  # (N, Hh, Hw, K)
        gt = np.concatenate(gts)  # (N, 4, 2) input px
        # weakest-channel image = the dead-channel tail candidate
        chan_max = hm.max(axis=(1, 2))  # (N, K)
        dead_idx = int(chan_max.min(axis=1).argmin())
        # highest-error images under the SHIPPED gated decode
        from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib

        coords01, conf = jax.jit(hm_lib.decode_argmax_subpixel_gated)(hm)
        px = np.asarray(hm_lib.coords01_to_pixels(coords01, (h, w)))
        err = np.sqrt(((px - gt) ** 2).sum(-1)).max(axis=1)  # (N,)
        order = [i for i in np.argsort(-err) if i != dead_idx][:3]
        keep = [dead_idx] + [int(i) for i in order]
        np.savez_compressed(
            os.path.join(args.out, "hrnet_decode_fixture.npz"),
            heatmaps=hm[keep].astype(np.float16),
            gt_corners=gt[keep].astype(np.float32),
            indices=np.asarray(keep, np.int32),
            dead_channel_conf=chan_max[dead_idx].astype(np.float32),
            image_hw=np.asarray([h, w], np.int32),
            platform=np.asarray(platform),
            epoch=np.asarray(int(meta.get("epoch", -1))),
        )
        print(
            f"hrnet fixture: dead idx {dead_idx} chan_max={chan_max[dead_idx]}"
            f" worst3={order} errs={err[keep]} platform={platform}"
        )
    else:
        h = w = args.imgsz
        model = create_model("yolo12n_pose")
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        bs_l, sc_l, kp_l, gts = [], [], [], []
        for images, corners in eval_batches(h, w):
            b, s, kk = fwd(variables, images)
            bs_l.append(np.asarray(b, np.float32))
            sc_l.append(np.asarray(s, np.float32))
            kp_l.append(np.asarray(kk, np.float32))
            gts.append(np.asarray(corners))
        boxes = np.concatenate(bs_l)
        scores = np.concatenate(sc_l)
        kpts = np.concatenate(kp_l)
        gt = np.concatenate(gts)
        import jax.numpy as jnp

        from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
            top1_detection,
        )

        # worst under the ungated (pre-r5) decode = the flip-image finder
        kp_old = np.asarray(
            ungated_top1(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(kpts))
        )[..., :2]
        err_old = np.sqrt(((kp_old - gt) ** 2).sum(-1)).max(axis=1)
        flip_idx = int(err_old.argmax())
        _, _, kp_new = jax.jit(top1_detection)(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(kpts)
        )
        err_new = np.sqrt(
            ((np.asarray(kp_new)[..., :2] - gt) ** 2).sum(-1)
        ).max(axis=1)
        order = [i for i in np.argsort(-err_new) if i != flip_idx][:3]
        keep = [flip_idx] + [int(i) for i in order]
        np.savez_compressed(
            os.path.join(args.out, "yolo_decode_fixture.npz"),
            # coordinates stay float32 (fp16 has ~0.5 px ulp at 640);
            # npz compression handles the size
            boxes=boxes[keep].astype(np.float32),
            scores=scores[keep].astype(np.float16),
            kpts=kpts[keep].astype(np.float32),
            gt_corners=gt[keep].astype(np.float32),
            indices=np.asarray(keep, np.int32),
            ungated_err_px=err_old[keep].astype(np.float32),
            image_hw=np.asarray([h, w], np.int32),
            platform=np.asarray(platform),
            epoch=np.asarray(int(meta.get("epoch", -1))),
        )
        print(
            f"yolo fixture: flip idx {flip_idx} ungated_err={err_old[flip_idx]:.1f}px"
            f" gated_err={err_new[flip_idx]:.1f}px worst3={order} platform={platform}"
        )


if __name__ == "__main__":
    main()
