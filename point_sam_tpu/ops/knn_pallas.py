"""Pallas TPU kernel for the tokenizer's large-k approximate kNN.

Replaces the XLA ``lax.approx_min_k`` *partial-reduction phase* of the
G x N x K neighbor search (reference: pc_sam/model/common.py:27-56 computes
the same neighbor sets with a materialized ``torch.cdist`` + ``topk``).
Round-3 on-chip measurements (scripts/kbench.py): at G=2048, N=100k, K=256,
recall 0.9, the fused ``sq_dist + approx_min_k(aggregate_to_topk=False)``
stream costs 4.8 ms while its arithmetic floor is <1 ms — XLA's generated
reduction loop is far from speed-of-light. This kernel streams the
distance computation and bin-minima entirely in VMEM:

- Keys are processed in tiles of ``tile_n`` points; each tile contributes
  128 *disjoint* bins (bin b of tile t holds the min over keys
  ``{t*tile_n + g*128 + b : g}``), so every output element is written by
  exactly one grid step — no cross-step accumulation, no "arbitrary"
  dimension semantics, no revisiting.
- Distances use the |q|^2 - 2 q.k + |k|^2 expansion in ONE homogeneous MXU
  matmul at bf16_3x-equivalent precision — same semantics as ops.distance.sq_dist
  and plenty exact for neighbor *ranking* (the interp kernel, which feeds
  weights rather than ranks, keeps per-coordinate differences; see
  interp_pallas.py). Ties between exactly-equidistant keys may resolve to
  either key (the tree min is not scan-ordered) — immaterial for an
  approximate neighbor set.
- The final k-selection over the ~L bin minima is a second
  ``lax.approx_min_k`` at high recall (~1 ms at [2048, 3200] -> 256, ~7x
  faster than ``lax.top_k`` on the same input — measured, scripts/kbench.py
  agg_topk stage). The exact-aggregation form
  (``reduction_input_size_override``) would be ideal but crashes the axon
  chipless AOT compiler; see the inline note in ``knn_binned_pallas``.

Recall contract: the total bin count L is chosen to be >= the L that
``lax.approx_min_k`` itself would use at the requested ``recall_target``
(probed shape-only via ``jax.eval_shape``), so expected neighbor recall
matches or exceeds the stock approx path's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG_COORD = 1e9  # sentinel coordinate for padded/invalid keys
_LANES = 128


def _bin_min_kernel(c_ref, k_ref, d_ref, i_ref, *, tile_n: int):
    """One (center-tile, key-tile) grid step.

    c_ref [1, tile_g, 64] centers; k_ref [1, tile_n, 64] key coords
    (homogeneous-encoded, lane-major); outputs d_ref/i_ref [1, tile_g, 128]: per-bin
    minimum squared distance and the *global* key index attaining it.

    Round-3 v2: the whole distance expansion rides the MXU as one
    homogeneous matmul (see below) and the per-bin argmin is a lane-halving tree over whole-width vectors
    instead of a 32-step per-group loop — the v1 group loop issued ~11
    broadcast ops per 128-lane group and measured ~2x slower than the
    stock approx_min_k stream it meant to replace.
    """
    c = c_ref[0]  # [tile_g, 64] homogeneous rows [-2x,-2y,-2z, |q|^2, 1, 0..]
    kk = k_ref[0]  # [tile_n, 64] homogeneous rows [x, y, z, 1, |k|^2, 0..]
    # ONE matmul yields the full |q|^2 - 2 q.k + |k|^2 expansion: the
    # homogeneous lanes carry the squared norms through the contraction, so
    # the kernel has no [1, N]/[G, 1] broadcast epilogue. Layout mirrors the
    # attention kernel's q@k^T exactly (lane-lane contraction over 64 — the
    # one matmul shape proven on this chip); an 8-lane contraction and a
    # [1, N] sublane broadcast BOTH hard-crash Mosaic here ("Check failed:
    # limits[i] <= dim(i)", round-3 finding). bf16_3x-equivalent precision
    # (~2^-21 relative) is ample for neighbor ranking and for the returned
    # squared distances (consumers use the indices).
    # Mosaic lowers only DEFAULT dot precision (HIGH/HIGHEST raise
    # NotImplementedError, round-3 finding), so the matmul runs in plain
    # bf16 passes and the ~2^-9 relative distance noise is compensated by
    # a 3-term Dekker-style split: d2 = hi.hi + hi.lo + lo.hi reproduces
    # bf16_3x (~2^-21 relative) with three DEFAULT-precision matmuls.
    c_hi = c.astype(jnp.bfloat16).astype(jnp.float32)
    c_lo = c - c_hi
    k_hi = kk.astype(jnp.bfloat16).astype(jnp.float32)
    k_lo = kk - k_hi
    dims = (((1,), (1,)), ((), ()))

    def _mm(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32)

    d2 = _mm(c_hi, k_hi) + (_mm(c_hi, k_lo) + _mm(c_lo, k_hi))
    # [tile_g, tile_n] squared distances

    # Lane-halving (val, group-id) tree min down to 128 lanes. `<=` keeps
    # the left operand on value ties; after the first level the left
    # operand's group id is not always the smaller one, so exact
    # equidistant-key ties may resolve to either key (documented in the
    # module header — immaterial for an approximate neighbor set).
    idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) // _LANES
    width = tile_n
    while width > _LANES:
        half = width // 2
        lo, hi = d2[:, :half], d2[:, half:width]
        il, ih = idx[:, :half], idx[:, half:width]
        keep = lo <= hi
        d2 = jnp.where(keep, lo, hi)
        idx = jnp.where(keep, il, ih)
        width = half

    ni = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d_ref[0] = d2
    i_ref[0] = ni * tile_n + idx * _LANES + lane


def _choose_tiling(n: int, k: int, recall_target: float):
    """Pick (tile_n, n_tiles, n_pad) so that total bins L = n_tiles * 128
    is >= the L lax.approx_min_k would use for (n, k, recall_target)."""
    l_target = jax.eval_shape(
        lambda x: jax.lax.approx_min_k(
            x, k, recall_target=recall_target, aggregate_to_topk=False
        )[0],
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ).shape[-1]
    l_target = max(l_target, 2 * _LANES)
    n_tiles = -(-l_target // _LANES)
    # groups-per-tile must be a power of two for the kernel's lane-halving
    # argmin tree (pads carry a sentinel coordinate, so rounding up only
    # costs compute on guaranteed-losing lanes).
    groups = -(-n // (n_tiles * _LANES))
    groups = 1 << (groups - 1).bit_length()
    tile_n = _LANES * groups
    return tile_n, n_tiles, n_tiles * tile_n


def binned_dispatch_ok(nq: int, nk: int, k: int) -> bool:
    """Static gate: TPU backend and shapes where the kernel wins (large key
    sets; the stock fused path is fine for small ones).

    DISABLED pending a Mosaic fix: the compiled kernel currently
    hard-crashes the axon chipless AOT compiler at the flagship shape
    ("Check failed: limits[i] <= dim(i)" in array.h — reproduced with a
    pure attention-style 64-lane matmul body, so the trigger is in the
    grid/tree structure, under bisection in round 3). The SIGABRT is not
    catchable by the dispatch fallback, so the gate stays off until the
    kernel compiles clean; interpret-mode semantics are green
    (tests/test_knn_binned.py) and the on-chip gate is re-asserted by
    tests/tpu_smoke.py::check_knn_binned when re-enabled."""
    del nq, nk, k
    return False


@functools.partial(
    jax.jit,
    static_argnames=("k", "recall_target", "merge_recall", "tile_g",
                     "interpret"),
)
def knn_binned_pallas(
    query: jnp.ndarray,
    key: jnp.ndarray,
    k: int,
    *,
    key_valid: jnp.ndarray | None = None,
    recall_target: float = 0.9,
    merge_recall: float = 0.95,
    tile_g: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate kNN: (sq_dists [B, Nq, k], indices [B, Nq, k] int32),
    sorted ascending. Same contract as ops.knn's approx path."""
    B, nq, _ = query.shape
    nk = key.shape[1]
    tile_n, n_tiles, n_pad = _choose_tiling(nk, k, recall_target)

    q = query.astype(jnp.float32)
    kf = key.astype(jnp.float32)
    if key_valid is not None:
        kf = jnp.where(key_valid[..., None], kf, _BIG_COORD)
    if n_pad != nk:
        kf = jnp.pad(kf, ((0, 0), (0, n_pad - nk), (0, 0)),
                     constant_values=_BIG_COORD)
    # Homogeneous 64-lane encoding (see _bin_min_kernel): queries become
    # [-2x, -2y, -2z, |q|^2, 1, 0...], keys [x, y, z, 1, |k|^2, 0...], so a
    # single MXU contraction emits squared distances directly. The squared
    # norms are computed here in fp32 (exact); padded/invalid keys carry the
    # big sentinel in their coordinates so their |k|^2 ~ 3e18 guarantees
    # they lose every bin min against any real key.
    hdim = 64
    ones = jnp.ones(q.shape[:-1] + (1,), jnp.float32)
    qz = jnp.zeros(q.shape[:-1] + (hdim - 5,), jnp.float32)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    q = jnp.concatenate([-2.0 * q, q_sq, ones, qz], axis=-1)
    k_ones = jnp.ones(kf.shape[:-1] + (1,), jnp.float32)
    kz = jnp.zeros(kf.shape[:-1] + (hdim - 5,), jnp.float32)
    k_sq = jnp.sum(kf * kf, axis=-1, keepdims=True)
    kf = jnp.concatenate([kf, k_ones, k_sq, kz], axis=-1)  # [B, n_pad, 64]

    g_pad = -(-nq // tile_g) * tile_g
    if g_pad != nq:
        q = jnp.pad(q, ((0, 0), (0, g_pad - nq), (0, 0)))

    from jax.experimental.pallas import tpu as pltpu

    grid = (B, g_pad // tile_g, n_tiles)
    bin_d, bin_i = pl.pallas_call(
        functools.partial(_bin_min_kernel, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_g, 64), lambda b, gi, ni: (b, gi, 0)),
            pl.BlockSpec((1, tile_n, 64), lambda b, gi, ni: (b, ni, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_g, _LANES), lambda b, gi, ni: (b, gi, ni)),
            pl.BlockSpec((1, tile_g, _LANES), lambda b, gi, ni: (b, gi, ni)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, g_pad, n_tiles * _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, g_pad, n_tiles * _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(q, kf)

    # Final k-selection over the ~L bin minima. Ideally this would be
    # lax.approx_min_k(reduction_input_size_override=n_pad) — the exact
    # aggregation XLA runs internally — but that parameter crashes the
    # chipless AOT TPU compiler (HTTP 500 in the axon compile helper,
    # round-3 finding). A plain second-stage approx_min_k at high recall
    # is nearly as fast; downstream consumers (grouping gathers into a
    # max-pooled PointNet) need the neighbor *set*, not exact order, and
    # the composite set-recall is re-measured in
    # tests/test_ops_geometry.py::TestKNN against the stock approx path.
    d, sel = jax.lax.approx_min_k(bin_d, k, recall_target=merge_recall)
    idx = jnp.take_along_axis(bin_i, sel, axis=-1)
    return d[:, :nq], idx[:, :nq].astype(jnp.int32)
