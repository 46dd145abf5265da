"""TPU-native MTG card perception framework.

A ground-up JAX/Flax/XLA/Pallas re-design of the capabilities of
``diegovazquez/mtg_card_image_segmentation``:

- binary card segmentation (MobileNetV3-Large + LR-ASPP, ``models/``)
- 4-corner keypoint estimation (heatmap HRNet-style and YOLO12n-pose variants)
- on-device data augmentation + synthetic data generation (``data/``)
- data-parallel + spatially-partitioned training over a TPU mesh (``parallel/``,
  ``training/``)
- streaming segmentation / corner metrics (``metrics.py``, ``evaluation/``)
- pruning + export (``compression/``, ``export/``)
- batched TPU serving (``serving/``)

Everything is NHWC, bf16-compute / fp32-params, and designed for XLA: static
shapes, `lax` control flow, fused Pallas kernels on the hot paths.
"""

from mtg_card_image_segmentation_tpu import config as config
from mtg_card_image_segmentation_tpu import losses as losses
from mtg_card_image_segmentation_tpu import metrics as metrics

__version__ = "0.1.0"
