from .losses import LossWeights, kl_to_w_avg, mse_loss, perplexity_loss
from .stage1 import (
    Stage1Setup,
    TrainState,
    build_stage1,
    init_train_state,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "LossWeights",
    "kl_to_w_avg",
    "mse_loss",
    "perplexity_loss",
    "Stage1Setup",
    "TrainState",
    "build_stage1",
    "init_train_state",
    "make_loss_fn",
    "make_optimizer",
    "make_train_step",
    "load_checkpoint",
    "save_checkpoint",
]
