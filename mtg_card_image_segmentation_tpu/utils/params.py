"""Parameter accounting (reference train/model.py:159-193)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    """Total number of scalars in a param pytree."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def model_size_mb(variables) -> float:
    """On-disk size of all variables (params + batch stats) in MB."""
    total_bytes = sum(
        int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
        for x in jax.tree.leaves(variables)
    )
    return total_bytes / 1024 / 1024
