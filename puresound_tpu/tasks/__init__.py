from .base import BaseTrainer, DataLoader, LearningRateScheduler, TaskDataset, TensorboardWriter
