"""Training stack: loss composition, regularizers, optimizers,
checkpointing, and the train/test driver loops."""
from . import checkpoints, driver, losses, optim, regularizers
from .losses import load_loss_fn
from .optim import load_optimizer

__all__ = ["losses", "regularizers", "optim", "checkpoints", "driver",
           "load_loss_fn", "load_optimizer"]
