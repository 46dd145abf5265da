from mtg_card_image_segmentation_tpu.ops.resize import (
    bilinear_resize,
    nearest_resize,
    upsample_add,
)

__all__ = ["bilinear_resize", "nearest_resize", "upsample_add"]
