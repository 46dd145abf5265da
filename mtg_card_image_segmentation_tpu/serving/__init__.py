from mtg_card_image_segmentation_tpu.serving.pose_predictor import (
    PosePredictor,
    YoloCornerPredictor,
)
from mtg_card_image_segmentation_tpu.serving.predictor import SegPredictor

__all__ = ["SegPredictor", "PosePredictor", "YoloCornerPredictor"]
