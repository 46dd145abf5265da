"""Optimizer + LR-schedule factories (optax).

Mirrors the reference factories (train/train.py:155-207): AdamW(lr, wd) or
SGD(momentum 0.9, wd); cosine annealing to ``lr * 0.01`` over the run, or
SGDR-style cosine restarts with first cycle ``num_epochs // 4`` doubling each
restart. The reference steps its scheduler once per epoch; here schedules are
per-step (``steps_per_epoch`` converts), which is strictly smoother.

The reference config carries WARMUP_EPOCHS=5 that its scheduler never uses;
we honor it as a real linear warmup when ``warmup_epochs > 0``.
"""

from __future__ import annotations

from typing import Optional

import optax

from mtg_card_image_segmentation_tpu.config import OptimizerConfig


def create_schedule(
    cfg: OptimizerConfig, num_epochs: int, steps_per_epoch: int
) -> optax.Schedule:
    total_steps = max(1, num_epochs * steps_per_epoch)
    # clamp: a 5-epoch warmup on a 1-epoch smoke run must still be valid
    warmup_steps = min(cfg.warmup_epochs * steps_per_epoch, total_steps // 2)
    base = cfg.learning_rate
    if cfg.schedule == "constant":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, base, warmup_steps)
        return optax.constant_schedule(base)
    if cfg.schedule == "cosine":
        eta_min = base * cfg.min_lr_ratio
        if warmup_steps > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=base,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
                end_value=eta_min,
            )
        return optax.cosine_decay_schedule(
            base, total_steps, alpha=cfg.min_lr_ratio
        )
    if cfg.schedule == "cosine_restarts":
        first_cycle = max(1, (num_epochs // cfg.restart_div) * steps_per_epoch)
        schedules = []
        boundaries = []
        cycle = first_cycle
        start = 0
        while start < total_steps:
            schedules.append(optax.cosine_decay_schedule(base, cycle, alpha=0.0))
            start += cycle
            boundaries.append(start)
            cycle *= cfg.restart_mult
        return optax.join_schedules(schedules, boundaries[:-1])
    raise ValueError(f"Unknown schedule {cfg.schedule!r}")


def create_optimizer(
    cfg: OptimizerConfig,
    num_epochs: int,
    steps_per_epoch: int,
    lr_scale: float = 1.0,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Returns (tx, schedule). ``lr_scale`` supports the pruning fine-tune
    loop's 0.1x lr (train/prune.py:192)."""
    schedule = create_schedule(
        OptimizerConfig(
            **{
                **cfg.__dict__,
                "learning_rate": cfg.learning_rate * lr_scale,
            }
        ),
        num_epochs,
        steps_per_epoch,
    )
    if cfg.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    else:
        raise ValueError(f"Unsupported optimizer {cfg.name!r}")
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx, schedule
