"""Mesh / sharding / distributed training step (SURVEY.md §2.4)."""

from .fsdp import fsdp_init_state, fsdp_place, fsdp_sharding_tree
from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .train_step import TrainState, make_optimizer, make_train_step

__all__ = [
    "DATA_AXIS",
    "fsdp_init_state",
    "fsdp_place",
    "fsdp_sharding_tree",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "TrainState",
    "make_optimizer",
    "make_train_step",
]
