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
from .stage2 import apply_temperature_anneal, build_stage2
from .trainer import train_gumbel_hvae, train_hvae_encoder

__all__ = [
    "apply_temperature_anneal",
    "build_stage2",
    "train_gumbel_hvae",
    "train_hvae_encoder",
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
