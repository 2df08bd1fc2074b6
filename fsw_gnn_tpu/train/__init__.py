from .trainer import TrainConfig, Trainer
from .minibatch import MinibatchTrainer
