"""Training: losses, train state, jit'd step, data-parallel sharding."""

from dmm_net_tpu.train.losses import mask_bce_loss, soft_iou_loss, clip_loss  # noqa: F401
from dmm_net_tpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    train_loop,
)
