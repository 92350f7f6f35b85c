"""FSDP-style parameter/optimizer-state sharding over the data axis.

The reference's only distribution mode is DDP with fully replicated
parameters (train.py:163-176) — fine for ViT-L, but the EVA-giant configs
(~1B params) cannot hold fp32 AdamW state on one 16 GB chip. Sharding
parameters and optimizer state over the ``data`` mesh axis (ZeRO-3 style)
divides that memory by the device count; XLA inserts the all-gathers
(params, forward/backward) and reduce-scatters (grads) over ICI from the
sharding annotations alone.

Usage: pass ``param_sharding="fsdp"`` to make_train_step and place the
TrainState with ``fsdp_shardings(state, mesh)``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _leaf_spec(leaf, n_dev: int, min_elements: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape or np.prod(shape) < min_elements:
        return P()
    # Shard the largest divisible axis (ties -> first), leave others whole.
    best = None
    for i, s in enumerate(shape):
        if s % n_dev == 0 and (best is None or s > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def fsdp_sharding_tree(tree, mesh: Mesh, *, min_elements: int = 2**14):
    """NamedSharding pytree for ``tree``: big leaves sharded along their
    largest device-count-divisible axis, small leaves replicated. Applies
    uniformly to params AND optimizer state (adam moments mirror params)."""
    n_dev = int(mesh.shape[DATA_AXIS])

    def one(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, n_dev, min_elements))

    return jax.tree_util.tree_map(one, tree)


def fsdp_place(tree, mesh: Mesh, *, min_elements: int = 2**14):
    """device_put a TrainState (or any pytree) with FSDP shardings."""
    sh = fsdp_sharding_tree(tree, mesh, min_elements=min_elements)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
