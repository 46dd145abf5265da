from mtg_card_image_segmentation_tpu.utils.params import (
    count_parameters,
    model_size_mb,
)

__all__ = ["count_parameters", "model_size_mb"]
