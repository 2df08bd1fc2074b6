from .trainer import TrainConfig, Trainer
