"""Training: unified jitted loop, benchmark runner, checkpointing."""

from position_induced_transformer_tpu.train.loop import (
    Task,
    TrainState,
    epoch_permutation,
    eval_permutation,
    make_eval_epoch,
    make_optimizer,
    make_train_epoch,
)

__all__ = [
    "Task",
    "TrainState",
    "epoch_permutation",
    "eval_permutation",
    "make_eval_epoch",
    "make_optimizer",
    "make_train_epoch",
]
