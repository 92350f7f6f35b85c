"""Device mesh + sharding helpers.

TPU-native replacement for the reference's distribution layer, which is
entirely HF Accelerate DDP over NCCL (reference: train.py:163-176,
SURVEY.md §2.4). Here parallelism is declarative: a 1-D ``data`` mesh axis,
batch arrays sharded on axis 0, parameters replicated (optionally sharded
along ``fsdp`` for the giant model), and XLA inserts the gradient
all-reduce over ICI inside the compiled step — there is no hand-written
collective and nothing like ``no_sync`` to manage (grad accumulation simply
sums inside the jitted step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: list | None = None, *, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    n_data: int, n_model: int, devices: list | None = None
) -> Mesh:
    """2-D (data, model) mesh for combined DP x tensor parallelism.

    The model axis should map to the fastest interconnect dimension (ICI
    neighbors) — tensor-parallel collectives (all-reduce of row-parallel
    matmul partials every layer) are latency-critical, while the data
    axis all-reduces gradients once per step.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) != n_data * n_model:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with axis-0 sharded over the mesh.

    Single-process: a plain sharded device_put. Multi-process (after
    parallel.distributed.initialize): each process holds only ITS shard of
    the global batch (BatchIterator process_index/count), and the global
    jax.Array is assembled from the process-local data — the JAX
    equivalent of DDP's per-rank DataLoader shard (reference
    train.py:129-134 under accelerate launch).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a host pytree over the mesh (all processes must call
    with identical values in the multi-process case)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
