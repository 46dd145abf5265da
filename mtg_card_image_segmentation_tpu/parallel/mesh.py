"""Device mesh + sharding layout for the card-perception models.

The reference is strictly single-device (``torch.device('cuda' if ...)``,
train/config.py:61 — no DDP/NCCL anywhere). Scale-out here is a first-class
TPU-native design instead:

- axis ``data``: batch (data parallelism). Gradients are all-reduced by XLA
  over ICI automatically because the loss is a global mean under jit/GSPMD.
- axis ``space``: spatial partitioning of the image H axis — the CNN analog of
  sequence/context parallelism. XLA's SPMD partitioner inserts halo exchanges
  for convolutions, so plain `lax.conv` works sharded.
- axis ``model``: channel sharding for very wide layers (off by default at
  3.2M params).

All computation is expressed on global arrays; `jax.jit` + `NamedSharding`
constraints drive GSPMD. BatchNorm statistics are computed over the *global*
batch (a `jnp.mean` over a data-sharded axis lowers to a psum over ICI), so
multi-chip training gets synchronized BN for free — stronger than the
reference's single-GPU BN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_HOSTS = "hosts"
AXIS_DATA = "data"
AXIS_SPACE = "space"
AXIS_MODEL = "model"


def make_mesh(
    data: int = -1,
    space: int = 1,
    model: int = 1,
    hosts: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(hosts, data, space, model)`` mesh over the available
    devices.

    ``hosts`` is the DCN axis for multi-host scale-out (SURVEY.md §2/§5):
    pure data parallelism whose collectives ride the data-center network,
    while ``data``/``space``/``model`` stay within a host's ICI domain.
    Under ``jax.distributed`` (parallel/distributed.py) ``jax.devices()``
    is the *global* device list ordered process-major, so reshaping with
    ``hosts`` leading puts each process's local devices in one DCN slice —
    gradient all-reduce lowers to (fast ICI reduce) + (one DCN all-reduce),
    the scaling-book hybrid layout. Single-process meshes keep ``hosts=1``
    and nothing changes.

    ``data=-1`` consumes all remaining devices. On a single chip this
    degenerates to a 1x1x1x1 mesh and all shardings become no-ops, so the
    same train step runs unchanged from 1 chip to a multi-host pod.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % (hosts * space * model) != 0:
            raise ValueError(
                f"{n} devices not divisible by "
                f"hosts*space*model={hosts * space * model}"
            )
        data = n // (hosts * space * model)
    if hosts * data * space * model != n:
        raise ValueError(
            f"mesh {hosts}x{data}x{space}x{model} != {n} available devices"
        )
    dev_array = np.asarray(devices).reshape(hosts, data, space, model)
    return Mesh(dev_array, (AXIS_HOSTS, AXIS_DATA, AXIS_SPACE, AXIS_MODEL))


def batch_spec() -> P:
    """PartitionSpec for NHWC image batches: batch over ``(hosts, data)``,
    H over ``space``."""
    return P((AXIS_HOSTS, AXIS_DATA), AXIS_SPACE, None, None)


def mask_spec() -> P:
    """PartitionSpec for (B, H, W) integer masks."""
    return P((AXIS_HOSTS, AXIS_DATA), AXIS_SPACE, None)


def replicated_spec() -> P:
    return P()


def is_trivial(mesh: Optional[Mesh]) -> bool:
    """True when sharding annotations would be no-ops (no mesh / 1 device).

    On the single-chip axon relay, arrays carrying a NamedSharding take a
    slow path (~0.5 s per transfer, measured: 5.1 s/step vs 15 ms/step on
    the HRNet pose train step) — so every sharding-aware component skips
    annotations entirely on a trivial mesh. Multi-device meshes (the CPU
    test mesh, real pod slices) keep the full GSPMD path.
    """
    return mesh is None or mesh.devices.size == 1


def shard_batch(mesh: Mesh, images: jax.Array, masks: Optional[jax.Array] = None):
    """Device-put a host batch onto the mesh with the canonical layout."""
    if is_trivial(mesh):
        images = jax.device_put(images)
        if masks is None:
            return images
        return images, jax.device_put(masks)
    images = jax.device_put(images, NamedSharding(mesh, batch_spec()))
    if masks is None:
        return images
    masks = jax.device_put(masks, NamedSharding(mesh, mask_spec()))
    return images, masks


def sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
