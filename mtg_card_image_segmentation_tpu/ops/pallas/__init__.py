"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA-composed reference implementation elsewhere in
``ops/`` / ``data/`` and is golden-tested against it (tests/test_pallas.py).
All kernels degrade gracefully: on non-TPU backends callers should use the
XLA reference (the `interpret=True` path is used in CPU tests).
"""

from mtg_card_image_segmentation_tpu.ops.pallas.preprocess import (
    fused_normalize,
)
from mtg_card_image_segmentation_tpu.ops.pallas.decoder import (
    fused_head_decode,
    fused_mask_decode,
    upsample2x_add,
)
from mtg_card_image_segmentation_tpu.ops.pallas.stem import fused_stem

__all__ = [
    "fused_normalize", "upsample2x_add", "fused_mask_decode",
    "fused_head_decode", "fused_stem",
]
