from mtg_card_image_segmentation_tpu.training.optim import (
    create_optimizer,
    create_schedule,
)
from mtg_card_image_segmentation_tpu.training.state import (
    SegTrainState,
    create_seg_state,
)
from mtg_card_image_segmentation_tpu.training.loop import (
    EarlyStopping,
    make_eval_step,
    make_train_step,
    recalibrate_batch_stats,
)

__all__ = [
    "create_optimizer",
    "create_schedule",
    "SegTrainState",
    "create_seg_state",
    "EarlyStopping",
    "make_train_step",
    "make_eval_step",
    "recalibrate_batch_stats",
]
