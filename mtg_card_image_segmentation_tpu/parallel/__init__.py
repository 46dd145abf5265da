from mtg_card_image_segmentation_tpu.parallel import distributed
from mtg_card_image_segmentation_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_HOSTS,
    AXIS_MODEL,
    AXIS_SPACE,
    batch_spec,
    make_mesh,
    mask_spec,
    replicated_spec,
    shard_batch,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_HOSTS",
    "AXIS_MODEL",
    "AXIS_SPACE",
    "batch_spec",
    "distributed",
    "make_mesh",
    "mask_spec",
    "replicated_spec",
    "shard_batch",
]
