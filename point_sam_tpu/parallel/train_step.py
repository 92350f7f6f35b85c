"""Jitted, mesh-sharded training step.

Replaces the reference's Accelerate-driven loop body (reference:
train.py:263-283: forward, criterion, backward with DDP all-reduce,
clip_grad_value_, AdamW step, scheduler step). Here the whole step —
forward (encode + unrolled click loop), loss, backward, gradient clip,
optimizer update — is one compiled XLA program; with a data-sharded batch
and replicated params, XLA emits the single gradient all-reduce over ICI
(the reference's only collective, SURVEY.md §2.4).

Gradient accumulation is an in-step ``lax.scan`` over microbatches — there
is no ``no_sync`` to manage (reference train.py:264-273): the all-reduce
happens once per optimizer step by construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import criterion as default_criterion


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    buffers: Any  # non-trainable variables (e.g. the PE gaussian matrix)
    opt_state: Any

    @classmethod
    def create(cls, params, buffers, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            buffers=buffers,
            opt_state=tx.init(params),
        )


def make_optimizer(
    lr_schedule: Callable,
    weight_decay: float = 0.1,
    max_grad_value: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW + clip-by-value, matching the reference recipe
    (train.py:154, :276-279; configs/large.yaml:24-27)."""
    return optax.chain(
        optax.clip(max_grad_value),
        optax.adamw(lr_schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    *,
    criterion: Callable = default_criterion,
    accum_steps: int = 1,
    donate: bool = True,
    param_sharding: str = "replicated",
    state_example=None,
):
    """Build the jitted train step.

    The returned fn has signature
        step_fn(state, batch, rng) -> (state, metrics)
    where batch = dict(coords [B,N,3], features [B,N,C], gt_masks [B,M,N])
    with B divisible by (mesh data axis size * accum_steps).
    """

    def loss_fn(params, buffers, batch, rng):
        outputs = model.apply(
            {"params": params, **buffers},
            batch["coords"],
            batch["features"],
            batch["gt_masks"],
            rngs={"sampler": rng},
        )
        B, M, N = batch["gt_masks"].shape
        gt_flat = batch["gt_masks"].reshape(B * M, N)
        loss, aux = criterion(outputs, gt_flat)
        metrics = _metrics_from_aux(outputs, aux, gt_flat)
        return loss, metrics

    def step_fn(state: TrainState, batch, rng):
        if accum_steps == 1:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.buffers, batch, rng
            )
        else:
            # Microbatch scan: split the batch leading axis into
            # [accum, B/accum, ...] and average grads in-step.
            def micro(carry, mb):
                g_acc, l_acc, m_acc = carry
                mb_batch, mb_rng = mb
                (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.buffers, mb_batch, mb_rng
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
                return (g_acc, l_acc + l, m_acc), None

            split = lambda x: x.reshape(  # noqa: E731
                (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]
            )
            mb_batches = jax.tree_util.tree_map(split, batch)
            rngs = jax.random.split(rng, accum_steps)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            first_mb = jax.tree_util.tree_map(lambda x: x[0], mb_batches)
            _, zero_m = jax.eval_shape(
                lambda: loss_fn(state.params, state.buffers, first_mb, rngs[0])
            )
            zero_m = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), zero_m
            )
            (grads, loss, metrics), _ = jax.lax.scan(
                micro, (zero_g, jnp.zeros(()), zero_m), (mb_batches, rngs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = dataclasses.replace(
            state, step=state.step + 1, params=params, opt_state=opt_state
        )
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        if param_sharding == "fsdp":
            # ZeRO-3 style: params + optimizer state sharded over the data
            # axis (see parallel.fsdp). XLA inserts the all-gathers /
            # reduce-scatters from the sharding annotations.
            if state_example is None:
                raise ValueError("fsdp sharding needs state_example")
            from .fsdp import fsdp_sharding_tree

            state_sh = fsdp_sharding_tree(state_example, mesh)
        elif param_sharding == "tp":
            # Megatron-style tensor parallelism over the mesh's "model"
            # axis (parallel.tensor_parallel); optimizer moments mirror
            # the param shardings, so the same rule tree applies to the
            # whole TrainState.
            if state_example is None:
                raise ValueError("tp sharding needs state_example")
            from .tensor_parallel import tp_sharding_tree

            state_sh = tp_sharding_tree(state_example, mesh)
        else:
            state_sh = repl
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, data, repl),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _metrics_from_aux(outputs, aux, gt_flat):
    """Scalar training metrics matching the reference's logging surface
    (train.py:284-304: per-iteration acc/fg_acc/bg_acc/iou/losses for the
    first and last click iterations)."""
    metrics = {}
    for tag, i in (("first", 0), ("last", len(aux) - 1)):
        best = aux[i]["best_masks"]  # [B*M, N] logits
        pred = best > 0
        gt = gt_flat
        metrics[f"{tag}/acc"] = jnp.mean(pred == gt)
        fg = jnp.maximum(jnp.sum(gt, -1), 1)
        bg = jnp.maximum(jnp.sum(~gt, -1), 1)
        metrics[f"{tag}/fg_acc"] = jnp.mean(jnp.sum(pred & gt, -1) / fg)
        metrics[f"{tag}/bg_acc"] = jnp.mean(jnp.sum(~pred & ~gt, -1) / bg)
        metrics[f"{tag}/iou"] = jnp.mean(aux[i]["iou"])
        metrics[f"{tag}/loss_mask"] = aux[i]["loss_mask"]
        metrics[f"{tag}/loss_iou"] = aux[i]["loss_iou"]
    return metrics
