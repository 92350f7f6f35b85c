"""Multi-host (multi-process) distribution.

TPU-native replacement for the reference's Accelerate rank handling: the
reference launches one process per GPU via ``accelerate launch``
(scripts/train_large.sh:1) and NCCL DDP handles rank init, per-rank data
sharding, and main-process guards (reference train.py:163-176). Here the
same responsibilities are:

- ``initialize()`` — ``jax.distributed.initialize`` (coordinator
  rendezvous; auto-detected on TPU pods/slices, explicit host/port for CPU
  tests and bring-your-own clusters). After it, ``jax.devices()`` is the
  GLOBAL device list, so the existing mesh builders (parallel.mesh) give
  global meshes with no further change — XLA runs gradient all-reduce over
  ICI within a slice and DCN across slices.
- per-process batch sharding — each process feeds only its shard of the
  global batch (datasets.build.BatchIterator ``process_index/count``),
  and ``mesh.shard_batch`` assembles the global jax.Array from the
  process-local shard.
- ``is_main_process()`` guards — wandb/stdout/PLY-dump equivalents of
  Accelerate's ``is_main_process`` (orbax checkpointing is itself
  multihost-aware and must be called from ALL processes).
"""

from __future__ import annotations

import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join (or create) the multi-process runtime.

    With no arguments, defers entirely to ``jax.distributed.initialize``'s
    auto-detection (TPU pod/slice metadata, cluster env vars). For CPU
    multi-process tests or manual clusters, pass coordinator/count/id
    explicitly (tests/test_multihost.py spawns two such processes).

    Safe to call when already initialized (no-op) and cheap to skip for
    single-process runs — call sites should gate on config/env.
    """
    import jax

    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and state.client is not None:  # already initialized
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def maybe_initialize(cfg) -> bool:
    """Config/env-driven ``initialize`` for the trainer entry point.

    Triggers when the config carries a ``distributed`` section
    (``distributed: {coordinator_address, num_processes, process_id}`` or
    ``distributed: auto``) or when the standard env vars of a launcher are
    present (``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
    ``JAX_PROCESS_ID``). Returns True if multi-process init ran.
    """
    dist = cfg.get("distributed") if hasattr(cfg, "get") else None
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not dist and not env_addr:
        return False
    if dist == "auto":
        initialize()
    elif dist:
        initialize(
            coordinator_address=dist.get("coordinator_address"),
            num_processes=dist.get("num_processes"),
            process_id=dist.get("process_id"),
        )
    else:
        initialize(
            coordinator_address=env_addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0
