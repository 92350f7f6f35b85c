"""Mesh / sharding / distributed training step (SURVEY.md §2.4)."""

from .fsdp import fsdp_init_state, fsdp_place, fsdp_sharding_tree
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh_2d,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .tensor_parallel import tp_place, tp_sharding_tree, tp_spec_tree
from .train_step import TrainState, make_optimizer, make_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh_2d",
    "tp_place",
    "tp_sharding_tree",
    "tp_spec_tree",
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
