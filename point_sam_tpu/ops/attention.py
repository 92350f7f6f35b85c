"""Pallas TPU multi-head attention kernel for the point-patch ViT.

The encoder attends over G <= 2048 patch tokens (reference backbone usage,
SURVEY.md §3.1 "HOTTEST"). The XLA einsum path materializes the
[B, H, G, G] fp32 logit tensor in HBM every layer (24 x ~270 MB round
trips for ViT-L at G=2048) — that HBM traffic, not FLOPs, dominates. This
kernel keeps everything on-chip: for each (batch, head, query-block), the
full K/V for that head live in VMEM, the [bq, G] logit block exists only in
VMEM/registers, softmax runs in fp32, and only the [bq, dh] output is
written back.

Token counts this small don't need online (streaming) softmax: the whole
key axis fits in VMEM, so this is a single-pass kernel — simpler and
faster than a streaming flash implementation at G <= 4k.

Exposed as ``mha(q, k, v)`` with an einsum fallback for CPU/debug.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # block shapes: q [1, 1, bq, dh]; k, v [1, 1, S, dh]; o [1, 1, bq, dh]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S]
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention, softmax over the full key axis.

    Args:
        q, k, v: [B, H, S, dh] (same S for q and k/v; no masking — encoder
            self-attention over patch tokens is dense).

    Returns: [B, H, S, dh] with q's dtype.
    """
    B, H, S, dh = q.shape
    scale = 1.0 / float(dh) ** 0.5
    bq = min(block_q, S)
    while S % bq and bq > 1:
        bq //= 2
    if S % bq:
        raise ValueError(f"S={S} must be divisible by some block_q <= {block_q}")

    grid = (B, H, S // bq)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, dh), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


@jax.custom_vjp
def mha_pallas_ad(q, k, v):
    """mha_pallas with a custom VJP (Pallas kernels aren't reverse-mode
    differentiable under remat's partial evaluation). Backward recomputes
    the softmax with plain XLA einsums — under the ViT's per-block remat
    only one layer's [S, S] intermediates are live at a time."""
    return mha_pallas(q, k, v)


def _mha_fwd(q, k, v):
    return mha_pallas(q, k, v), (q, k, v)


def _mha_bwd(res, do):
    q, k, v = res
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    do32 = do.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


mha_pallas_ad.defvjp(_mha_fwd, _mha_bwd)


def mha_reference(q, k, v):
    """Einsum attention (the fallback; numerics-matching fp32 softmax)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(dh))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def mha(q, k, v, *, use_pallas: bool | None = None):
    """[B, H, S, dh] attention with automatic kernel dispatch."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        S, dh = q.shape[2], q.shape[3]
        # Mosaic needs lane/sublane-friendly shapes; small configs (tests,
        # tiny presets) take the einsum path, where XLA is fine anyway.
        if S >= 128 and S % 128 == 0 and dh >= 64:
            return mha_pallas_ad(q, k, v)
    return mha_reference(q, k, v)
