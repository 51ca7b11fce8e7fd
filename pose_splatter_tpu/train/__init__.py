from pose_splatter_tpu.train.losses import iou_loss, masked_l1_loss, total_loss  # noqa: F401
from pose_splatter_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
