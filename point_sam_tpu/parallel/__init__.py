"""Mesh / sharding / distributed training step (SURVEY.md §2.4)."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .train_step import TrainState, eval_step, make_optimizer, make_train_step

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "TrainState",
    "eval_step",
    "make_optimizer",
    "make_train_step",
]
