"""Training: generic introspective steps, per-variant recipes, optimizers."""

from soft_intro_vae_tpu.train.state import TrainState
from soft_intro_vae_tpu.train.step import StepConfig, build_train_steps

__all__ = ["TrainState", "StepConfig", "build_train_steps"]
