from mtg_card_image_segmentation_tpu.models.registry import create_model
from mtg_card_image_segmentation_tpu.models.lraspp import CardSegmentationModel
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import MobileNetV3Backbone

__all__ = ["create_model", "CardSegmentationModel", "MobileNetV3Backbone"]
