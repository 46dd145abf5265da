from mtg_card_image_segmentation_tpu.evaluation.segmentation import SegEvaluator
from mtg_card_image_segmentation_tpu.evaluation.pose import (
    CornerEvaluator,
    PoseEvaluator,
    yolo_predict_step,
)

__all__ = ["SegEvaluator", "PoseEvaluator", "CornerEvaluator", "yolo_predict_step"]
