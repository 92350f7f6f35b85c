"""Pallas TPU kernel for farthest point sampling.

FPS is a G-step sequential loop where each step is (a) a distance update of
every point against the newly selected center and (b) an argmax. The XLA
``fori_loop`` version (ops.fps) pays per-iteration kernel-launch and HBM
round-trip costs ~2048 times. This kernel runs the WHOLE loop on-core with
the point cloud and the running min-distance field resident in VMEM
(100k points fp32 = 1.2 MB coordinates + 0.4 MB distances — comfortably
inside the ~16 MB budget up to ~700k points).

Per-step cost is dominated by serial full-array reductions, so the argmax
is hierarchical: the update pass also maintains a per-column (cross-sublane)
max [1, N8]; the argmax then runs over that 8x-smaller array, and only the
winning 8x128 tile is rescanned for the exact cell. Layout is lanes-major —
point n lives at (row = n % 8, col = n // 8) — which makes the
column-first/row-second tie-break identical to ops.fps_xla's smallest-index
rule, so the kernel is bit-exact against the XLA reference.

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
_BIG = 2**30  # python int: a module-level jnp scalar would be a captured constant


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(first_ref, b, xyz_ref, mind0_ref, out_ref, mind_ref,
                colmax_ref, *, num_samples: int, n8: int):
    """One grid program = one batch row ``b``.

    Refs: first [B] int32 (SMEM, scalar-prefetch), xyz [3, 8, N8] f32 (VMEM,
    lanes-major layout), mind0 [8, N8] f32 (VMEM), out [1, G] int32 (SMEM),
    scratch: mind [8, N8] f32, colmax [1, N8] f32 (VMEM).
    """
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    mind_ref[:] = mind0_ref[:]
    colmax_ref[:] = jnp.max(mind0_ref[:], axis=0, keepdims=True)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n8), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)

    def update(sel):
        # Point n = sel sits at (row = n % 8, col = n // 8). Extract its
        # coordinates from the aligned 8x128 tile containing its column
        # (dynamic loads must be tile-aligned), then update distances and
        # the per-column max in one pass.
        r = sel % _SUBLANES
        c = sel // _SUBLANES
        c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
        onehot = ((lane128 == (c - c0)) & (row128 == r)).astype(jnp.float32)
        # dynamic slices must come from refs (value-level dynamic_slice is
        # not lowered by Mosaic)
        cx = jnp.sum(xyz_ref[0, :, pl.ds(c0, _LANES)] * onehot)
        cy = jnp.sum(xyz_ref[1, :, pl.ds(c0, _LANES)] * onehot)
        cz = jnp.sum(xyz_ref[2, :, pl.ds(c0, _LANES)] * onehot)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        m = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = m
        colmax_ref[:] = jnp.max(m, axis=0, keepdims=True)

    first = first_ref[b]
    out_ref[b, 0] = first  # out lives in SMEM: scalar stores are legal
    update(first)

    def body(g, _):
        cm = colmax_ref[:]
        best = jnp.max(cm)
        c = jnp.min(jnp.where(cm == best, col_iota, _BIG))
        c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
        tile = mind_ref[:, pl.ds(c0, _LANES)]  # [8, 128]
        hit = (tile == best) & (lane128 == (c - c0))
        r = jnp.min(jnp.where(hit, row128, _BIG))
        sel = c * _SUBLANES + r
        out_ref[b, g] = sel
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

    def to_cells(arr):  # [B, n_pad] -> [B, 8, n8], point n at (n % 8, n // 8)
        return arr.reshape(B, n8, _SUBLANES).swapaxes(1, 2)

    xyz = jnp.pad(points, ((0, 0), (0, n_pad - N), (0, 0)))
    xyz = jnp.stack([to_cells(xyz[..., i]) for i in range(3)], axis=1)
    # xyz: [B, 3, 8, n8]

    if valid is not None:
        v = jnp.pad(valid, ((0, 0), (0, n_pad - N)))
        first = jnp.argmax(v, axis=1).astype(jnp.int32)
    else:
        v = (jnp.arange(n_pad) < N)[None].repeat(B, axis=0)
        first = jnp.zeros((B,), jnp.int32)
    mind0 = to_cells(jnp.where(v, jnp.inf, -jnp.inf).astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, _SUBLANES, n8), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, _SUBLANES, n8), lambda b, *_: (b, 0, 0)),
        ],
        # SMEM outputs must cover the full array (blocked SMEM shapes need
        # (8, 128)-divisible tiles); the kernel indexes its row by program id.
        out_specs=pl.BlockSpec((B, num_samples), lambda b, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((_SUBLANES, n8), jnp.float32),
            pltpu.VMEM((1, n8), jnp.float32),
        ],
    )

    def kernel(first_ref, xyz_ref, mind0_ref, out_ref, mind_scratch,
               colmax_scratch):
        b = pl.program_id(0)
        _fps_kernel(
            first_ref,
            b,
            xyz_ref.at[0],
            mind0_ref.at[0],
            out_ref.at[...],
            mind_scratch,
            colmax_scratch,
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
