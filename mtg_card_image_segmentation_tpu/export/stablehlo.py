"""StableHLO export — the TPU-native second serialization format.

Where the reference exports TorchScript alongside ONNX
(train/export.py:167-244), the TPU-native analog is ``jax.export``:
a versioned, portable StableHLO artifact that any XLA runtime (TPU, GPU,
CPU, IREE) can reload and execute without Python model code. Includes the
same self-test gate the reference applies (max|diff| < 1e-5 reloaded vs
source).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_stablehlo(
    fn: Callable,
    example_args: Tuple,
    path: str,
    self_test: bool = True,
    atol: float = 1e-5,
    platforms: Optional[Tuple[str, ...]] = None,
) -> dict:
    """Serialize ``jax.jit(fn)(*example_args)`` to ``path`` (.stablehlo)
    with a JSON sidecar describing the calling convention. Returns info.

    ``platforms`` lowers one artifact for several backends (e.g.
    ``("cpu", "tpu")``) so the deployment package is not locked to the
    exporting host's platform; the self-test still executes on the
    default backend."""
    from jax import export as jax_export

    exported = jax_export.export(
        jax.jit(fn), platforms=platforms
    )(*example_args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)

    info = {
        "format": "jax.export serialized StableHLO",
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "bytes": len(blob),
    }

    if self_test:
        reloaded = jax_export.deserialize(blob)
        ref = jax.jit(fn)(*example_args)
        out = reloaded.call(*example_args)
        max_diff = float(
            max(
                jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out))
            )
        )
        info["self_test_max_diff"] = max_diff
        info["self_test_pass"] = bool(max_diff < atol)
        if not info["self_test_pass"]:
            raise ValueError(f"StableHLO roundtrip diff {max_diff} >= {atol}")

    with open(path + ".json", "w") as f:
        json.dump(info, f, indent=2)
    return info
