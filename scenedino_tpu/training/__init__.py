from scenedino_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    sample_frame_split,
    stage1_forward,
)
