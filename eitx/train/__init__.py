from .trainer import TrainConfig, Trainer, TrainState
from .data import device_batches, synthetic_ct_batch

__all__ = ["TrainConfig", "Trainer", "TrainState", "synthetic_ct_batch"]
