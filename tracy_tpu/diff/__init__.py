from tracy_tpu.diff.gradients import (
    TrainableParams,
    apply_params,
    extract_params,
    render_loss,
    make_train_step,
    make_training_intersector,
)

__all__ = [
    "TrainableParams",
    "apply_params",
    "extract_params",
    "render_loss",
    "make_train_step",
    "make_training_intersector",
]
