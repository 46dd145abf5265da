#!/usr/bin/env python
"""Deterministic slim-bench fixture (VERDICT r3 #8: the slim serving number
must be reproducible from a fresh clone without a multi-hour retrain).

Builds a fixed-seed LR-ASPP MobileNetV3-Large state, applies the removable
expansion-channel prune (compression/slim.py, default 30% — the README's
slim operating point), and writes an orbax checkpoint that
``bench.py --slim --checkpoint <path>`` consumes:

  python tools/make_slim_fixture.py                # -> runs/slim_fixture/...
  python bench.py --slim --checkpoint runs/slim_fixture/checkpoints/slim_model

Serving THROUGHPUT depends on tensor shapes, not weight values, so the
random-init fixture measures the same img/s as a trained slim checkpoint
(same narrowed expansions); the IoU numbers in README come from real
training runs, not from this fixture.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--amount", type=float, default=0.3,
                        help="fraction of expansion channels to remove")
    parser.add_argument("--output-dir", default="runs/slim_fixture/checkpoints")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax

    from mtg_card_image_segmentation_tpu.compression.slim import (
        dead_expansion_channels,
        expansion_channel_prune,
        param_count,
    )
    from mtg_card_image_segmentation_tpu.config import OptimizerConfig, default_config
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import (
        checkpoint as ckpt_lib,
        create_optimizer,
        create_seg_state,
    )

    cfg = default_config()
    model = registry.from_config(cfg.model)
    tx, _ = create_optimizer(OptimizerConfig(), num_epochs=1, steps_per_epoch=1)
    state = jax.jit(
        lambda k: create_seg_state(
            model, tx, (1, cfg.model.input_height, cfg.model.input_width, 3), k
        )
    )(jax.random.key(args.seed))

    pruned_params, _ = expansion_channel_prune(state.params, args.amount)
    dead = dead_expansion_channels(pruned_params)
    n_dead = sum(v.size for v in dead.values())
    print(f"expansion prune: {n_dead} channels zeroed removably across "
          f"{len(dead)} blocks ({param_count(state.params):,} params dense)")
    state = state.replace(params=pruned_params)

    path = ckpt_lib.save_checkpoint(
        args.output_dir, "slim_model", state, epoch=0,
        config={"fixture": "make_slim_fixture", "amount": args.amount,
                "seed": args.seed},
    )
    print(f"slim fixture checkpoint -> {path}")
    print("measure: python bench.py --slim --checkpoint "
          f"{os.path.join(args.output_dir, 'slim_model')}")


if __name__ == "__main__":
    main()
