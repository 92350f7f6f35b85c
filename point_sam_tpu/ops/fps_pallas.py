"""Pallas TPU kernel for farthest point sampling.

FPS is a G-step sequential loop where each step is (a) a distance update of
every point against the newly selected center and (b) an argmax. The XLA
``fori_loop`` version (ops.fps) pays per-iteration kernel-launch and HBM
round-trip costs ~2048 times. This kernel runs the WHOLE loop on-core with
the point cloud and the running min-distance field resident in VMEM
(100k points fp32 = 1.2 MB coordinates + 0.4 MB distances — comfortably
inside the ~16 MB budget up to ~700k points).

Layout: coordinates are pre-transposed and reshaped to [3, 8, N8]
(8 sublanes x N8 lanes) so the per-step elementwise update and the argmax
reduction use full VPU rows. The flat point index of a (row, col) cell is
``row * N8 + col`` (row-major reshape), so selected linear indices map back
to original point indices directly.

Padding: the caller passes an init-distance array that is +inf for valid
points and -inf for padding — padded cells can never win the argmax and
stay -inf under ``minimum`` updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANES = 8
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(first_ref, b, xyz_ref, mind0_ref, out_ref, mind_ref, *,
                num_samples: int, n8: int):
    """One grid program = one batch row ``b``.

    Refs: first [B] int32 (SMEM, scalar-prefetch), xyz [3, 8, N8] f32 (VMEM),
    mind0 [8, N8] f32 (VMEM), out [1, G] int32 (SMEM),
    mind scratch [8, N8] f32 (VMEM).
    """
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    mind_ref[:] = mind0_ref[:]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 1)
    linear_ids = row_ids * n8 + col_ids

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)

    def update(sel):
        # Dynamic loads must be tile-aligned: load the aligned
        # [8 sublanes x 128 lanes] tile containing the selected cell, then
        # extract the scalar with a tiny one-hot reduction (avoids a
        # full-array masked extraction pass per coordinate).
        r = sel // n8
        c = sel % n8
        c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
        onehot = ((lane_iota == (c - c0)) & (row_iota == r)).astype(jnp.float32)
        bx = xyz_ref[0, :, pl.ds(c0, _LANES)]
        by = xyz_ref[1, :, pl.ds(c0, _LANES)]
        bz = xyz_ref[2, :, pl.ds(c0, _LANES)]
        cx = jnp.sum(bx * onehot)
        cy = jnp.sum(by * onehot)
        cz = jnp.sum(bz * onehot)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        mind_ref[:] = jnp.minimum(mind_ref[:], d)

    first = first_ref[b]
    out_ref[0, 0] = first  # out lives in SMEM: scalar stores are legal
    update(first)

    def body(g, _):
        m = mind_ref[:]
        best = jnp.max(m)
        # argmax via masked min-index (first occurrence on ties, matching
        # jnp.argmax row-major semantics).
        sel = jnp.min(jnp.where(m == best, linear_ids, jnp.int32(2**30)))
        out_ref[0, g] = sel
        update(sel)
        return 0

    if num_samples > 1:
        jax.lax.fori_loop(1, num_samples, body, 0)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fps_pallas(
    points: jnp.ndarray,
    num_samples: int,
    *,
    valid: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.fps_xla (same selection semantics).

    Args:
        points: [B, N, 3] fp32.
        num_samples: G (static).
        valid: optional [B, N] bool.

    Returns: [B, G] int32 indices.
    """
    if points.dtype != jnp.float32:
        points = points.astype(jnp.float32)
    B, N, _ = points.shape
    n_pad = _round_up(N, _SUBLANES * _LANES)
    n8 = n_pad // _SUBLANES

    xyz = jnp.pad(points, ((0, 0), (0, n_pad - N), (0, 0)))
    xyz = jnp.moveaxis(xyz, -1, 1).reshape(B, 3, _SUBLANES, n8)

    if valid is not None:
        v = jnp.pad(valid, ((0, 0), (0, n_pad - N)))
        first = jnp.argmax(v, axis=1).astype(jnp.int32)
    else:
        v = (jnp.arange(n_pad) < N)[None].repeat(B, axis=0)
        first = jnp.zeros((B,), jnp.int32)
    mind0 = jnp.where(v, jnp.inf, -jnp.inf).astype(jnp.float32)
    mind0 = mind0.reshape(B, _SUBLANES, n8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, _SUBLANES, n8), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, _SUBLANES, n8), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, num_samples), lambda b, *_: (b, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((_SUBLANES, n8), jnp.float32)],
    )

    def kernel(first_ref, xyz_ref, mind0_ref, out_ref, mind_scratch):
        b = pl.program_id(0)
        _fps_kernel(
            first_ref,
            b,
            xyz_ref.at[0],
            mind0_ref.at[0],
            out_ref.at[...],
            mind_scratch,
            num_samples=num_samples,
            n8=n8,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        interpret=interpret,
    )(first, xyz, mind0)
    return out
