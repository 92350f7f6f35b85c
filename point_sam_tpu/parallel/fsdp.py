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


def fsdp_init_state(init_fn, init_args, tx, mesh, *,
                    min_elements: int = 2**14):
    """Initialize a TrainState sharded FROM BIRTH.

    Materializing full fp32 params + AdamW moments on one device before
    resharding (init -> tx.init -> fsdp_place) peaks at the full replicated
    state — OOM at exactly the model scale FSDP exists for. Here shapes come
    from ``jax.eval_shape`` and both the variable init and the optimizer
    init are jitted with FSDP ``out_shardings``, so no device ever holds
    more than its shard.

    Args:
        init_fn: pure fn(*init_args) -> flax variables dict.
        init_args: example args (rngs + batch arrays).
        tx: optax transformation.

    Returns: (TrainState, variables-shapes tree) with params/buffers/
    opt_state sharded over the mesh.
    """
    from .train_step import TrainState

    var_shapes = jax.eval_shape(init_fn, *init_args)
    var_sh = fsdp_sharding_tree(var_shapes, mesh, min_elements=min_elements)
    variables = jax.jit(init_fn, out_shardings=var_sh)(*init_args)
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}

    opt_shapes = jax.eval_shape(tx.init, params)
    opt_sh = fsdp_sharding_tree(opt_shapes, mesh, min_elements=min_elements)
    opt_state = jax.jit(tx.init, out_shardings=opt_sh)(params)

    import jax.numpy as jnp

    step = jax.device_put(
        jnp.zeros((), jnp.int32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    return TrainState(step=step, params=params, buffers=buffers,
                      opt_state=opt_state)
