"""Training: optax optimizers/schedules, losses wiring, the AAT loop, GAN aux."""

from paif_tpu.train.optimizer import poly_warmup_schedule, poly_warmup_adamw
from paif_tpu.train.aat import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_aat_train_step,
    joint_loss,
)

__all__ = [
    "poly_warmup_schedule",
    "poly_warmup_adamw",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_aat_train_step",
    "joint_loss",
]
