"""Training runtime: TrainState, jitted/shard_map'd step, epoch driver."""

from mmvae_tpu.train.state import TrainState, create_train_state
from mmvae_tpu.train.loop import make_train_step, make_eval_step, fit
from mmvae_tpu.train.metrics import MetricsLogger
from mmvae_tpu.train import checkpoint

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "fit",
    "MetricsLogger",
    "checkpoint",
]
