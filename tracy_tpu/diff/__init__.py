from tracy_tpu.diff.gradients import (
    TrainableParams,
    apply_params,
    extract_params,
    render_loss,
    make_train_step,
)

__all__ = [
    "TrainableParams",
    "apply_params",
    "extract_params",
    "render_loss",
    "make_train_step",
]
