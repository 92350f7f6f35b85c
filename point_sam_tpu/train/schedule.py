"""LR schedules (optax).

Equivalent of the reference's detectron2-style ``WarmupMultiStepLR``
(reference: pc_sam/optim/lr_scheduler.py:10-78): linear (or constant)
warmup factor multiplied onto a step decay at milestones. Expressed as an
optax schedule function (step -> lr), branch-free for jit.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_multistep(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
):
    """Returns an optax-compatible schedule fn: step -> learning rate."""
    if list(milestones) != sorted(milestones):
        raise ValueError(f"milestones must be increasing, got {milestones}")
    if warmup_method not in ("linear", "constant"):
        raise ValueError(f"unknown warmup method {warmup_method!r}")
    ms = jnp.asarray(list(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear":
            alpha = jnp.minimum(step / max(warmup_iters, 1), 1.0)
            wf = warmup_factor * (1.0 - alpha) + alpha
        else:
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        decay = gamma ** jnp.sum(step >= ms.astype(jnp.float32))
        return base_lr * wf * decay

    return schedule
