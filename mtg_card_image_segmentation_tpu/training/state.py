"""Train state: params + BatchNorm statistics + optimizer state, one pytree.

Replaces the reference's {model,optimizer,scheduler} state-dict checkpoint
triple (train/utils.py:227-251) with a single functional pytree that shards /
checkpoints / donates cleanly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class SegTrainState(train_state.TrainState):
    batch_stats: Any = None

    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_seg_state(
    model,
    tx: optax.GradientTransformation,
    input_shape: tuple[int, int, int, int],
    rng: jax.Array,
) -> SegTrainState:
    """Initialize params/batch-stats with a dummy batch and build the state.

    init is jitted: eager per-op dispatch of a 180-layer init is pathological
    on remote-compile TPU backends (minutes instead of seconds)."""
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros(input_shape, jnp.float32), train=False
    )
    return SegTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
