from mtg_card_image_segmentation_tpu.utils.params import (
    count_parameters,
    model_size_mb,
)
from mtg_card_image_segmentation_tpu.utils.platform import apply_platform_env

__all__ = ["count_parameters", "model_size_mb", "apply_platform_env"]
