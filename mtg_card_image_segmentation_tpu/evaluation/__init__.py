from mtg_card_image_segmentation_tpu.evaluation.segmentation import SegEvaluator
from mtg_card_image_segmentation_tpu.evaluation.pose import PoseEvaluator

__all__ = ["SegEvaluator", "PoseEvaluator"]
