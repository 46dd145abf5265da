from mtg_card_image_segmentation_tpu.export.fold_bn import fold_batch_norm

__all__ = ["fold_batch_norm"]
