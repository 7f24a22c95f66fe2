from .trainer import TrainConfig, Trainer, TrainState
from .data import synthetic_ct_batch

__all__ = ["TrainConfig", "Trainer", "TrainState", "synthetic_ct_batch"]
