#!/usr/bin/env python
"""Pruning CLI (reference: python train/prune.py): load checkpoint ->
evaluate -> prune (global magnitude or structured channels) -> fine-tune at
0.1x lr with sparsity preserved -> BN recalibration -> evaluate -> report.

  python prune_seg.py --checkpoint ckpts/best_model --amount 0.3
  python prune_seg.py --checkpoint ckpts/best_model --structured --fine-tune-epochs 2
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--amount", type=float, default=0.3)
    parser.add_argument(
        "--method", choices=["magnitude", "structured", "expansion"],
        default=None,
        help="magnitude: global unstructured L1 (train/prune.py:68-72); "
        "structured: per-conv output channels (:76-93); expansion: "
        "inverted-residual expansion channels zeroed *removably* — "
        "export_seg.py --slim then physically deletes them",
    )
    parser.add_argument("--structured", action="store_true",
                        help="alias for --method structured")
    parser.add_argument("--fine-tune-epochs", type=int, default=0)
    parser.add_argument("--fine-tune-steps", type=int, default=50, help="steps/epoch")
    parser.add_argument("--eval-batches", type=int, default=5)
    parser.add_argument("--output-dir", default="pruned")
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mtg_card_image_segmentation_tpu import metrics as metrics_lib
    from mtg_card_image_segmentation_tpu.compression import (
        magnitude_prune,
        masked_optimizer,
        sparsity_report,
        structured_channel_prune,
    )
    from mtg_card_image_segmentation_tpu.config import default_config
    from mtg_card_image_segmentation_tpu.data.pipeline import SyntheticPipeline
    from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only
    from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.parallel import make_mesh
    from mtg_card_image_segmentation_tpu.training import (
        checkpoint as ckpt_lib,
        create_optimizer,
        create_seg_state,
        make_eval_step,
        make_train_step,
        recalibrate_batch_stats,
    )

    cfg = default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)
    h, w = cfg.model.input_height, cfg.model.input_width
    batch = cfg.data.batch_size
    mesh = make_mesh()

    model = create_model("lraspp_mobilenet_v3_large")
    recal_model = create_model("lraspp_mobilenet_v3_large", bn_momentum=0.0)
    tx, _ = create_optimizer(cfg.optimizer, 1, 1)
    state = create_seg_state(model, tx, (1, h, w, 3), jax.random.key(0))
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    state, _ = ckpt_lib.load_checkpoint(ckpt_dir or ".", name, state, params_only=True)

    @jax.jit
    def make_eval_batch(key):
        b = synthetic_batch(key, batch, h, w)
        return normalize_only(b.image), b.mask

    eval_step = make_eval_step(mesh=mesh)

    def evaluate(state):
        cm = metrics_lib.ConfusionAccumulator()
        for i in range(args.eval_batches):
            images, masks = make_eval_batch(jax.random.key(5_000_000 + i))
            _, c = eval_step(state, images, masks)
            cm.update(c)
        return cm.result()

    before = evaluate(state)
    print(f"before pruning: iou_card={before['iou_card']:.4f}")

    method = args.method or ("structured" if args.structured else "magnitude")
    if method == "expansion":
        from mtg_card_image_segmentation_tpu.compression.slim import (
            expansion_channel_prune,
        )

        pruned_params, masks = expansion_channel_prune(state.params, args.amount)
        pruned_params = jax.tree.map(jnp.asarray, pruned_params)
        masks = jax.tree.map(jnp.asarray, masks)
    else:
        prune_fn = structured_channel_prune if method == "structured" else magnitude_prune
        pruned_params, masks = prune_fn(state.params, args.amount)
    state = state.replace(params=pruned_params)
    sp = sparsity_report(state.params)
    print(
        f"pruned ({method}, "
        f"amount={args.amount}): global sparsity {sp['global_sparsity']:.1%}, "
        f"compression {sp['compression_ratio']:.2f}x"
    )

    if args.fine_tune_epochs > 0:
        # fine-tune at 0.1x lr with masked updates (train/prune.py:172-239)
        ft_tx, _ = create_optimizer(
            cfg.optimizer, args.fine_tune_epochs, args.fine_tune_steps, lr_scale=0.1
        )
        ft_tx = masked_optimizer(ft_tx, masks)
        ft_state = create_seg_state(model, ft_tx, (1, h, w, 3), jax.random.key(1))
        ft_state = ft_state.replace(
            params=state.params, batch_stats=state.batch_stats
        )
        step_fn = make_train_step(mesh=mesh)
        pipe = iter(SyntheticPipeline(batch, h, w, mesh=mesh, seed=7))
        total = args.fine_tune_epochs * args.fine_tune_steps
        for i in range(total):
            images, m = next(pipe)
            ft_state, stats = step_fn(ft_state, images, m)
            if (i + 1) % 25 == 0:
                print(f"fine-tune {i + 1}/{total} loss={float(stats['loss']):.4f}")
        state = state.replace(
            params=ft_state.params, batch_stats=ft_state.batch_stats
        )
        sp_after = sparsity_report(state.params)
        print(f"sparsity after fine-tune: {sp_after['global_sparsity']:.1%}")

    recal = [
        make_eval_batch(jax.random.key(6_000_000 + i))[0] for i in range(4)
    ]
    state = recalibrate_batch_stats(state, recal_model, recal, mesh=mesh)
    after = evaluate(state)
    print(f"after pruning:  iou_card={after['iou_card']:.4f}")

    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_lib.save_checkpoint(
        args.output_dir, "pruned_model", state, 0, after["iou_card"],
        config=cfg.to_dict(),
    )
    report = {
        "method": method,
        "amount": args.amount,
        "before": before,
        "after": after,
        "iou_card_delta": after["iou_card"] - before["iou_card"],
        "sparsity": {k: v for k, v in sp.items() if k != "layers"},
    }
    with open(os.path.join(args.output_dir, "pruning_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"pruned checkpoint + report -> {args.output_dir}/")


if __name__ == "__main__":
    main()
