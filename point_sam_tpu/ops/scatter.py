"""Segment reductions (scatter-max) for the voronoi tokenizer path.

TPU-native equivalent of the reference's ``torch.scatter_reduce(..., "amax")``
aggregation of per-point features onto their nearest center
(reference: pc_sam/model/common.py:524-535, pc_encoder.py:190-193,
prompt_encoder.py:286-297). Built on ``jax.ops.segment_max`` which XLA
lowers to an efficient sorted-segment reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_max(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    num_segments: int,
    *,
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Per-batch segment max of point features onto centers.

    Args:
        x: [B, N, C] features.
        idx: [B, N] int segment (center) index per point.
        num_segments: number of centers L (static).
        fill_value: value for centers that receive no points. The reference
            initializes the output with zeros and uses include_self semantics
            that keep the zero when a segment is empty, so 0.0 matches.

    Returns:
        [B, L, C].
    """

    def one(xb, ib):
        out = jax.ops.segment_max(xb, ib, num_segments=num_segments)
        # segment_max fills empty segments with -inf; match the reference's
        # zero-initialized scatter buffer.
        return jnp.where(jnp.isneginf(out), jnp.asarray(fill_value, out.dtype), out)

    return jax.vmap(one)(x, idx)


def gather_segments(y: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-center features back to points: out[b, n] = y[b, idx[b, n]].

    (Reference: common.py:529-530 gathers the scattered max back per point.)
    """
    return jnp.take_along_axis(y, idx[..., None], axis=1)
