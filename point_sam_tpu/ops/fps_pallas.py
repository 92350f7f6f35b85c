"""Pallas TPU kernel for farthest point sampling.

FPS is a G-step sequential loop where each step is (a) a distance update of
every point against the newly selected center and (b) an argmax. The XLA
``fori_loop`` version (ops.fps) pays per-iteration kernel-launch and HBM
round-trip costs ~2048 times. This kernel runs the WHOLE loop on-core with
the point cloud and the running min-distance field resident in VMEM
(100k points fp32 = 1.2 MB coordinates + 0.4 MB distances per batch row).

Performance shape (v3): the loop is latency-bound — each step's critical
path is a handful of full-array VPU passes over [8, N/8], so the design
minimizes FULL-WIDTH passes per step:

1. **Center extraction is O(128), not O(N).** The selected point's
   coordinates are read with one 128-lane-aligned dynamic block load plus a
   [8, 128] one-hot multiply-reduce — three tile-sized sums instead of the
   v2 kernel's three full-width one-hot passes (which were ~60% of the
   step's traversed bytes at N=100k).
2. **Two full-width passes per step.** (a) distance update fused with the
   per-row running max; (b) the tie-break pass ``where(m == gmax, col,
   BIG) -> per-row min``. Everything after is [8, 1]-shaped: the global
   winner is resolved with tiny cross-row reductions.
3. **Batch rows share one grid program, stage-interleaved.** Independent
   rows' reduction trees overlap in the in-order pipeline because the body
   loops over rows *per stage*, so B>1 amortizes per-step latency instead
   of multiplying it.

Layout: row-major — point n lives at (row = n // n8, col = n % n8) — so
"smallest n" decomposes as (smallest row attaining the global max, smallest
col within that row), which is exactly what the per-row min-col + cross-row
min composition computes. Selection is therefore bit-exact vs ops.fps_xla
(same fp32 distance arithmetic, same smallest-index tie-break).

Padding: the caller passes an init-distance array that is +inf for valid
points and -inf for padding — padded cells can never win the argmax and
stay -inf under ``minimum`` updates.

Reference being replaced: torkit3d CUDA ``sample_farthest_points``
(reference .gitmodules:16-18, call sites pc_sam/model/common.py:91,199).
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

# VMEM working set per batch row: xyz [24, n8] + mind scratch [8, n8] +
# mind0 input block [8, n8], all fp32.
_PER_ROW_F32 = 24 + 8 + 8
_VMEM_BUDGET_BYTES = 11 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fps_kernel(first_ref, xyz_ref, mind0_ref, out_ref, mind_ref, col_ref,
                *, num_samples: int, n8: int, rows: int):
    """One grid program = ``rows`` batch rows, stage-interleaved.

    Refs: first [B] int32 (SMEM, scalar-prefetch), xyz [rows, 24, n8] f32
    (VMEM; sublanes 0-7 = x, 8-15 = y, 16-23 = z at (n // n8, n % n8)),
    mind0 [rows, 8, n8] f32, out [B, G] int32 (SMEM, full array — rows
    index it globally), scratch: mind [rows, 8, n8] f32, col [8, n8] int32
    (col index per cell, shared by all rows).
    """
    base = pl.program_id(0) * rows
    mind_ref[:] = mind0_ref[:]
    col_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)

    firsts = []
    for b in range(rows):
        f = first_ref[base + b]
        out_ref[base + b, 0] = f
        firsts.append(f)

    def body(g, sels):
        # Stage 1 — extract each row's current center from one 128-aligned
        # block: [24, 128] load + [8, 128] one-hot reduce (O(128) work).
        centers = []
        for b in range(rows):
            sel = sels[b]
            r = sel // n8
            c = sel - r * n8
            c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
            blk = xyz_ref[b, :, pl.ds(c0, _LANES)]  # [24, 128]
            oh = ((row128 == r) & (lane128 == c - c0)).astype(jnp.float32)
            cx = jnp.sum(blk[0:_SUBLANES] * oh, axis=(0, 1), keepdims=True)
            cy = jnp.sum(
                blk[_SUBLANES : 2 * _SUBLANES] * oh, axis=(0, 1), keepdims=True
            )
            cz = jnp.sum(
                blk[2 * _SUBLANES : 3 * _SUBLANES] * oh,
                axis=(0, 1),
                keepdims=True,
            )
            centers.append((cx, cy, cz))
        # Stage 2 — full-width distance update + per-row running max.
        maxes = []
        for b in range(rows):
            cx, cy, cz = centers[b]
            x = xyz_ref[b, 0:_SUBLANES]
            y = xyz_ref[b, _SUBLANES : 2 * _SUBLANES]
            z = xyz_ref[b, 2 * _SUBLANES : 3 * _SUBLANES]
            d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
            m = jnp.minimum(mind_ref[b], d)
            mind_ref[b] = m
            maxes.append(jnp.max(m, axis=(0, 1), keepdims=True))
        # Stage 3 — tie-break pass: smallest col per row among cells at the
        # global max, then smallest n = r * n8 + col across rows ([8, 1]
        # reductions; the jnp.min to a scalar is the step's single
        # vector->scalar transition, needed for the SMEM store).
        new_sels = []
        for b in range(rows):
            t = jnp.where(mind_ref[b] == maxes[b], col_ref[:], _BIG)
            rcol = jnp.min(t, axis=1, keepdims=True)  # [8, 1]
            n_row = jnp.where(rcol < _BIG, row8 * n8 + rcol, _BIG)
            sel = jnp.min(n_row)
            out_ref[base + b, g] = sel
            new_sels.append(sel)
        return tuple(new_sels)

    if num_samples > 1:
        jax.lax.fori_loop(1, num_samples, body, tuple(firsts))


def _fps_interp_kernel(first_ref, xyz_ref, mind0_ref, out_ref, ctr_ref,
                       b3d_ref, b3i_ref, mind_ref, col_ref, *,
                       num_samples: int, n8: int, rows: int):
    """FPS fused with exact 3-NN center search (interp geometry).

    Identical selection loop to ``_fps_kernel`` — same stages, same
    tie-breaks, bit-exact indices — plus a running best-3 insertion per
    point, fed by the distance field stage 2 ALREADY computes for every
    selected center. The separate [N, G] interpolation distance pass
    (ops/interp_pallas.py, ~2.4 ms at N=100k/G=2048) disappears: across
    the G selection steps this loop touches every (center, point) pair
    once, which is exactly the matrix the 3-NN search needs.

    The insertion is off the selection critical path (nothing reads
    ``b3d``/``b3i`` until the kernel ends), so its VPU passes overlap the
    step's reduction latencies instead of extending them.

    Extra refs vs ``_fps_kernel``: b3d [rows, 24, n8] f32 and b3i
    [rows, 24, n8] int32 VMEM outputs — sublanes [8k : 8k+8] hold the
    k-th nearest center's squared distance / center slot for the point at
    (n // n8, n % n8). Ties resolve to the smaller center slot (strict
    less-than inserts after equal entries; centers are inserted in slot
    order), matching compute_interp_weights' first-index tie-break.

    ``ctr`` [rows, 8, G] f32 VMEM output: sublanes 0/1/2 hold x/y/z of
    center slot g at lane g (exact extracted fp32 — bit-equal to a
    gather). Emitting centers from the kernel makes the downstream kNN
    query an opaque kernel OUTPUT instead of a gather: XLA fuses a
    gathered query into the kNN distance matmul with row-major operand
    layouts, +1.8 ms at the eval shape (scripts/kbench11/12). The store
    is an O(128) aligned blend per step, off the selection critical path.

    The selection loop runs one extra iteration (g = num_samples) so the
    LAST selected center's distance field — which plain FPS never needs —
    is computed and folded into the best-3; the out-of-range selection
    store is predicated off.
    """
    base = pl.program_id(0) * rows
    mind_ref[:] = mind0_ref[:]
    ctr_ref[:] = jnp.zeros_like(ctr_ref)
    b3d_ref[:] = jnp.full_like(b3d_ref, jnp.inf)
    b3i_ref[:] = jnp.zeros_like(b3i_ref)
    col_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)
    lane_g = (jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, num_samples), 1)
              if num_samples < _LANES else None)

    firsts = []
    for b in range(rows):
        f = first_ref[base + b]
        out_ref[base + b, 0] = f
        firsts.append(f)

    def body(g, sels):
        gi = g - 1  # slot of the center whose distances this step computes
        # Stage 1 — extract each row's current center (O(128) work) and
        # blend-store it into the ctr output (aligned [8, 128] block).
        centers = []
        for b in range(rows):
            sel = sels[b]
            r = sel // n8
            c = sel - r * n8
            c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
            blk = xyz_ref[b, :, pl.ds(c0, _LANES)]  # [24, 128]
            oh = ((row128 == r) & (lane128 == c - c0)).astype(jnp.float32)
            cx = jnp.sum(blk[0:_SUBLANES] * oh, axis=(0, 1), keepdims=True)
            cy = jnp.sum(
                blk[_SUBLANES : 2 * _SUBLANES] * oh, axis=(0, 1), keepdims=True
            )
            cz = jnp.sum(
                blk[2 * _SUBLANES : 3 * _SUBLANES] * oh,
                axis=(0, 1),
                keepdims=True,
            )
            coef = (
                jnp.where(row8 == 0, cx, 0.0)
                + jnp.where(row8 == 1, cy, 0.0)
                + jnp.where(row8 == 2, cz, 0.0)
            )  # [8, 1]
            if num_samples >= _LANES:
                off = pl.multiple_of((gi // _LANES) * _LANES, _LANES)
                cblk = ctr_ref[b, :, pl.ds(off, _LANES)]
                ctr_ref[b, :, pl.ds(off, _LANES)] = jnp.where(
                    lane128 == gi - off, coef, cblk
                )
            else:
                ctr_ref[b] = jnp.where(lane_g == gi, coef, ctr_ref[b])
            centers.append((cx, cy, cz))
        # Stage 2 — full-width distance update + per-row running max,
        # plus the best-3 insertion of (d, g-1). The insertion feeds
        # nothing this step, so it hides under the reduction latencies.
        maxes = []
        for b in range(rows):
            cx, cy, cz = centers[b]
            x = xyz_ref[b, 0:_SUBLANES]
            y = xyz_ref[b, _SUBLANES : 2 * _SUBLANES]
            z = xyz_ref[b, 2 * _SUBLANES : 3 * _SUBLANES]
            d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
            m = jnp.minimum(mind_ref[b], d)
            mind_ref[b] = m
            maxes.append(jnp.max(m, axis=(0, 1), keepdims=True))

            b0 = b3d_ref[b, 0:_SUBLANES]
            b1 = b3d_ref[b, _SUBLANES : 2 * _SUBLANES]
            b2 = b3d_ref[b, 2 * _SUBLANES : 3 * _SUBLANES]
            i0 = b3i_ref[b, 0:_SUBLANES]
            i1 = b3i_ref[b, _SUBLANES : 2 * _SUBLANES]
            i2 = b3i_ref[b, 2 * _SUBLANES : 3 * _SUBLANES]
            lt0 = d < b0
            lt1 = d < b1
            lt2 = d < b2
            b3d_ref[b, 2 * _SUBLANES : 3 * _SUBLANES] = jnp.where(
                lt2, jnp.where(lt1, b1, d), b2
            )
            b3i_ref[b, 2 * _SUBLANES : 3 * _SUBLANES] = jnp.where(
                lt2, jnp.where(lt1, i1, gi), i2
            )
            b3d_ref[b, _SUBLANES : 2 * _SUBLANES] = jnp.where(
                lt1, jnp.where(lt0, b0, d), b1
            )
            b3i_ref[b, _SUBLANES : 2 * _SUBLANES] = jnp.where(
                lt1, jnp.where(lt0, i0, gi), i1
            )
            b3d_ref[b, 0:_SUBLANES] = jnp.where(lt0, d, b0)
            b3i_ref[b, 0:_SUBLANES] = jnp.where(lt0, gi, i0)
        # Stage 3 — tie-break + store, skipped on the final extra pass.
        new_sels = []
        for b in range(rows):
            t = jnp.where(mind_ref[b] == maxes[b], col_ref[:], _BIG)
            rcol = jnp.min(t, axis=1, keepdims=True)  # [8, 1]
            n_row = jnp.where(rcol < _BIG, row8 * n8 + rcol, _BIG)
            sel = jnp.min(n_row)
            new_sels.append(sel)

        @pl.when(g < num_samples)
        def _store():
            for b in range(rows):
                out_ref[base + b, g] = new_sels[b]

        return tuple(new_sels)

    jax.lax.fori_loop(1, num_samples + 1, body, tuple(firsts))


def _fps_interp_knn_kernel(first_ref, xyz_ref, mind0_ref, out_ref,
                           b3d_ref, b3i_ref, cd_ref, ci_ref, mind_ref,
                           col_ref, pm_ref, *, num_samples: int, n8: int,
                           l_lanes: int):
    """FPS + 3-NN interp + binned kNN candidates, one VMEM pass (rows=1).

    Extends ``_fps_interp_kernel`` (same selection + interp stages,
    bit-exact) with two additions that complete the geometry fusion:

    * **kNN in-kernel kills the gather pessimization.** The production
      composed path gathers FPS centers and XLA fuses that gather into the
      kNN distance matmul with row-major layouts (+1.8 ms at N=100k,
      scripts/kbench11.py). With the kNN folded in-kernel, the external
      centers gather (done by the wrapper) feeds nothing hot. (An SMEM
      [B, G, 3] centers output was tried and overflowed the 1 MB SMEM
      budget by 8 KB at G=2048 — the wrapper gather is free anyway.)
    * **kNN candidate fold.** Step g's distance field d [8, n8] — already
      computed for the FPS min-update — is folded into ``8 * l_lanes``
      bins (bin of point n = (n // n8, (n % n8) % l_lanes)): a pairwise
      min-tree over the ``n8 / l_lanes`` lane chunks, carrying (distance,
      col). This is exactly ``lax.approx_min_k``'s bin-then-top-k recipe
      (expected top-k recall ~= 1 - (k-1)/(2 * 8 * l_lanes), ~0.969 for
      k=256 at the default 4096 bins — above the rt=0.9 operating point's
      measured 0.96), but the [G, N] distance matrix never exists: the
      production approx path materializes it twice through HBM (819 MB at
      2048 x 100k) because ``PartialReduce`` is a custom call that cannot
      fuse its producer. Padded/invalid points are excluded by a +inf
      additive mask derived from the -inf cells of ``mind0``.

    The caller finishes with an exact ``lax.top_k`` over the 8 * l_lanes
    bins. Reference being replaced: the tokenizer's knn_points call
    (pc_sam/model/common.py:89-97) at eval scale (eval_kitti.py:350-362).

    Extra refs vs ``_fps_interp_kernel``: cd [1, G, 8, l_lanes] f32 bin
    min-distances, ci [1, G, 8, l_lanes] int32 global point ids, pm
    [8, n8] f32 scratch (+inf where padded/invalid).
    """
    base = pl.program_id(0)
    mind_ref[:] = mind0_ref[0]
    pm_ref[:] = jnp.where(mind0_ref[0] == -jnp.inf,
                          jnp.float32(jnp.inf), jnp.float32(0.0))
    b3d_ref[:] = jnp.full_like(b3d_ref, jnp.inf)
    b3i_ref[:] = jnp.zeros_like(b3i_ref)
    col_ref[:] = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, l_lanes), 1)
    row_l = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, l_lanes), 0)
    chunks = n8 // l_lanes

    first = first_ref[base]
    out_ref[base, 0] = first

    def body(g, sel):
        # Stage 1 — extract the current center (O(128) work).
        gi = g - 1  # slot of the center whose distances this step computes
        r = sel // n8
        c = sel - r * n8
        c0 = pl.multiple_of((c // _LANES) * _LANES, _LANES)
        blk = xyz_ref[0, :, pl.ds(c0, _LANES)]  # [24, 128]
        oh = ((row128 == r) & (lane128 == c - c0)).astype(jnp.float32)
        cx = jnp.sum(blk[0:_SUBLANES] * oh, axis=(0, 1), keepdims=True)
        cy = jnp.sum(
            blk[_SUBLANES : 2 * _SUBLANES] * oh, axis=(0, 1), keepdims=True
        )
        cz = jnp.sum(
            blk[2 * _SUBLANES : 3 * _SUBLANES] * oh, axis=(0, 1),
            keepdims=True,
        )
        # Stage 2 — full-width distance update + per-row running max,
        # best-3 interp insertion, and the kNN bin fold. The fold feeds
        # nothing on the selection critical path.
        x = xyz_ref[0, 0:_SUBLANES]
        y = xyz_ref[0, _SUBLANES : 2 * _SUBLANES]
        z = xyz_ref[0, 2 * _SUBLANES : 3 * _SUBLANES]
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        m = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = m
        mx = jnp.max(m, axis=(0, 1), keepdims=True)

        b0 = b3d_ref[0, 0:_SUBLANES]
        b1 = b3d_ref[0, _SUBLANES : 2 * _SUBLANES]
        b2 = b3d_ref[0, 2 * _SUBLANES : 3 * _SUBLANES]
        i0 = b3i_ref[0, 0:_SUBLANES]
        i1 = b3i_ref[0, _SUBLANES : 2 * _SUBLANES]
        i2 = b3i_ref[0, 2 * _SUBLANES : 3 * _SUBLANES]
        lt0 = d < b0
        lt1 = d < b1
        lt2 = d < b2
        b3d_ref[0, 2 * _SUBLANES : 3 * _SUBLANES] = jnp.where(
            lt2, jnp.where(lt1, b1, d), b2
        )
        b3i_ref[0, 2 * _SUBLANES : 3 * _SUBLANES] = jnp.where(
            lt2, jnp.where(lt1, i1, gi), i2
        )
        b3d_ref[0, _SUBLANES : 2 * _SUBLANES] = jnp.where(
            lt1, jnp.where(lt0, b0, d), b1
        )
        b3i_ref[0, _SUBLANES : 2 * _SUBLANES] = jnp.where(
            lt1, jnp.where(lt0, i0, gi), i1
        )
        b3d_ref[0, 0:_SUBLANES] = jnp.where(lt0, d, b0)
        b3i_ref[0, 0:_SUBLANES] = jnp.where(lt0, gi, i0)

        # kNN bin fold: pairwise min-tree over lane chunks of the masked
        # field. Ties keep the LEFT operand (strict < on the right), so the
        # winner within a bin is the smallest point id.
        dm = d + pm_ref[:]
        ds = [dm[:, i * l_lanes : (i + 1) * l_lanes] for i in range(chunks)]
        cs = [lane_l + i * l_lanes for i in range(chunks)]
        while len(ds) > 1:
            nd, nc = [], []
            for j in range(0, len(ds) - 1, 2):
                lt = ds[j + 1] < ds[j]
                nd.append(jnp.where(lt, ds[j + 1], ds[j]))
                nc.append(jnp.where(lt, cs[j + 1], cs[j]))
            if len(ds) % 2:
                nd.append(ds[-1])
                nc.append(cs[-1])
            ds, cs = nd, nc
        cd_ref[0, gi] = ds[0]
        ci_ref[0, gi] = row_l * n8 + cs[0]

        # Stage 3 — tie-break + store, skipped on the final extra pass.
        t = jnp.where(m == mx, col_ref[:], _BIG)
        rcol = jnp.min(t, axis=1, keepdims=True)  # [8, 1]
        n_row = jnp.where(rcol < _BIG, row8 * n8 + rcol, _BIG)
        new_sel = jnp.min(n_row)

        @pl.when(g < num_samples)
        def _store():
            out_ref[base, g] = new_sel

        return new_sel

    jax.lax.fori_loop(1, num_samples + 1, body, first)


@functools.partial(
    jax.jit, static_argnames=("num_samples", "k", "l_lanes", "interpret")
)
def fps_interp_knn_pallas(
    points: jnp.ndarray,
    num_samples: int,
    k: int,
    *,
    valid: jnp.ndarray | None = None,
    l_lanes: int = 512,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FPS + centers + exact 3-NN interp + approx k-NN in ONE VMEM pass.

    Selection and interp are bit-exact vs ``fps_interp_pallas``; the k-NN
    uses the same bin-then-top-k scheme as ``lax.approx_min_k`` (8 *
    ``l_lanes`` bins, expected recall ~0.969 at k=256) but never
    materializes the [G, N] distance matrix — see ``_fps_interp_knn_kernel``.

    VMEM: the candidate buffers are G * 8 * l_lanes * 8 bytes (67 MB at
    G=2048, l_lanes=512), so the caller should keep B=1 per kernel program
    (the wrapper grids over B; ops.fps dispatch gates on B == 1).

    Returns:
        (fps_idx [B, G] int32, centers [B, G, 3] f32,
         interp_idx [B, N, 3] int32, interp_d [B, N, 3] f32 ascending,
         knn_idx [B, G, k] int32 sorted ascending by squared distance).
    """
    if points.dtype != jnp.float32:
        points = points.astype(jnp.float32)
    B, N, _ = points.shape
    G = num_samples
    if G < 3:
        raise ValueError("fps_interp_knn_pallas requires num_samples >= 3")
    if k > 8 * l_lanes:
        raise ValueError(f"k={k} exceeds bin count {8 * l_lanes}")
    # n8 must tile into l_lanes-wide chunks: n_pad % (8 * l_lanes) == 0.
    n_pad = _round_up(N, _SUBLANES * max(_LANES, l_lanes))
    n8 = n_pad // _SUBLANES

    def to_cells(arr):
        return arr.reshape(arr.shape[0], _SUBLANES, n8)

    xyz = jnp.pad(points, ((0, 0), (0, n_pad - N), (0, 0)))
    xyz = jnp.concatenate(
        [to_cells(xyz[..., i]) for i in range(3)], axis=1
    )  # [B, 24, n8]

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
            pl.BlockSpec((1, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, G), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, G, _SUBLANES, l_lanes),
                         lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, G, _SUBLANES, l_lanes),
                         lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUBLANES, n8), jnp.float32),
            pltpu.VMEM((_SUBLANES, n8), jnp.int32),
            pltpu.VMEM((_SUBLANES, n8), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _fps_interp_knn_kernel, num_samples=G, n8=n8, l_lanes=l_lanes
    )
    idx, b3d, b3i, cd, ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, G), jnp.int32),
            jax.ShapeDtypeStruct((B, 3 * _SUBLANES, n8), jnp.float32),
            jax.ShapeDtypeStruct((B, 3 * _SUBLANES, n8), jnp.int32),
            jax.ShapeDtypeStruct((B, G, _SUBLANES, l_lanes), jnp.float32),
            jax.ShapeDtypeStruct((B, G, _SUBLANES, l_lanes), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20
        ),
        interpret=interpret,
    )(first, xyz, mind0)

    def from_cells(arr):  # [B, 24, n8] -> [B, N, 3]
        parts = [
            arr[:, 8 * j : 8 * (j + 1)].reshape(B, n_pad)[:, :N]
            for j in range(3)
        ]
        return jnp.stack(parts, axis=-1)

    # Exact top-k over the bins (the cheap final stage approx_min_k also
    # runs); ties resolve to the lower bin index via top_k stability.
    neg_d, pos = jax.lax.top_k(-cd.reshape(B, G, _SUBLANES * l_lanes), k)
    knn_idx = jnp.take_along_axis(
        ci.reshape(B, G, _SUBLANES * l_lanes), pos, axis=-1
    )
    # Empty bins (d=+inf) carry padded-cell ids; they are only selected in
    # the degenerate < k-valid-points case — clamp to stay in range.
    knn_idx = jnp.minimum(knn_idx, N - 1)
    # Centers via a plain gather: with kNN in-kernel this gather feeds no
    # hot matmul (the composed path's +1.8 ms layout trap, kbench11/12).
    ctr = jnp.take_along_axis(points, idx[..., None], axis=1)
    return idx, ctr, from_cells(b3i), from_cells(b3d), knn_idx


@functools.partial(
    jax.jit, static_argnames=("num_samples", "with_centers", "interpret")
)
def fps_interp_pallas(
    points: jnp.ndarray,
    num_samples: int,
    *,
    valid: jnp.ndarray | None = None,
    with_centers: bool = False,
    interpret: bool = False,
):
    """FPS + exact 3-NN interp geometry in ONE VMEM-resident pass.

    Same selection semantics as ``fps_pallas`` (bit-exact indices); the
    3-NN squared distances use the identical explicit-difference fp32
    formula as ops/interp_pallas.py (bit-exact vs that kernel).

    With ``with_centers`` the kernel's center coordinates output is also
    returned (bit-equal to gathering ``points`` at ``fps_idx``): consuming
    it instead of a gather keeps XLA from fusing a gathered query into the
    downstream kNN distance matmul with slow row-major layouts (+1.8 ms at
    N=100k/G=2048, scripts/kbench11/12).

    Returns:
        (fps_idx [B, G] int32, interp_idx [B, N, 3] int32 center slots,
         interp_d [B, N, 3] fp32 squared distances, ascending)
        — or, with ``with_centers``, (fps_idx, centers [B, G, 3] f32,
        interp_idx, interp_d).
    """
    if points.dtype != jnp.float32:
        points = points.astype(jnp.float32)
    B, N, _ = points.shape
    if num_samples < 3:
        raise ValueError("fps_interp_pallas requires num_samples >= 3")
    n_pad = _round_up(N, _SUBLANES * _LANES)
    n8 = n_pad // _SUBLANES

    # Per-row VMEM: xyz 24 + mind0 8 + mind 8 + b3d 24 + b3i 24 slices.
    per_row = _PER_ROW_F32 + 48
    rows = max(1, min(B, _VMEM_BUDGET_BYTES // (per_row * n8 * 4)))
    b_pad = _round_up(B, rows)

    def to_cells(arr):
        return arr.reshape(arr.shape[0], _SUBLANES, n8)

    xyz = jnp.pad(points, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
    xyz = jnp.concatenate(
        [to_cells(xyz[..., i]) for i in range(3)], axis=1
    )  # [b_pad, 24, n8]

    if valid is not None:
        v = jnp.pad(valid, ((0, 0), (0, n_pad - N)))
        first = jnp.argmax(v, axis=1).astype(jnp.int32)
    else:
        v = (jnp.arange(n_pad) < N)[None].repeat(B, axis=0)
        first = jnp.zeros((B,), jnp.int32)
    mind0 = to_cells(
        jnp.pad(
            jnp.where(v, jnp.inf, -jnp.inf).astype(jnp.float32),
            ((0, b_pad - B), (0, 0)),
            constant_values=-jnp.inf,
        )
    )
    first = jnp.pad(first, (0, b_pad - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((rows, _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, num_samples), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, _SUBLANES, num_samples),
                         lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((rows, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((rows, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, _SUBLANES, n8), jnp.float32),
            pltpu.VMEM((_SUBLANES, n8), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _fps_interp_kernel, num_samples=num_samples, n8=n8, rows=rows
    )
    idx, ctr, b3d, b3i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, num_samples), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, _SUBLANES, num_samples),
                                 jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 3 * _SUBLANES, n8), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 3 * _SUBLANES, n8), jnp.int32),
        ],
        interpret=interpret,
    )(first, xyz, mind0)

    # Cell layout -> [B, N, 3]: sublanes [8k : 8k+8] of slice k flatten
    # back to linear point order (point n at (n // n8, n % n8)).
    def from_cells(arr):  # [b_pad, 24, n8] -> [B, N, 3]
        parts = [
            arr[:B, 8 * k : 8 * (k + 1)].reshape(B, n_pad)[:, :N]
            for k in range(3)
        ]
        return jnp.stack(parts, axis=-1)

    if with_centers:
        centers = jnp.moveaxis(ctr[:B, :3], 1, 2)  # [B, G, 3]
        return idx[:B], centers, from_cells(b3i), from_cells(b3d)
    return idx[:B], from_cells(b3i), from_cells(b3d)


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

    # Rows per grid program, bounded by the VMEM working set.
    rows = max(1, min(B, _VMEM_BUDGET_BYTES // (_PER_ROW_F32 * n8 * 4)))
    b_pad = _round_up(B, rows)

    def to_cells(arr):  # [B, n_pad] -> [B, 8, n8], point n at (n // n8, n % n8)
        return arr.reshape(arr.shape[0], _SUBLANES, n8)

    xyz = jnp.pad(points, ((0, b_pad - B), (0, n_pad - N), (0, 0)))
    xyz = jnp.concatenate(
        [to_cells(xyz[..., i]) for i in range(3)], axis=1
    )  # [b_pad, 24, n8]

    if valid is not None:
        v = jnp.pad(valid, ((0, 0), (0, n_pad - N)))
        first = jnp.argmax(v, axis=1).astype(jnp.int32)
    else:
        v = (jnp.arange(n_pad) < N)[None].repeat(B, axis=0)
        first = jnp.zeros((B,), jnp.int32)
    mind0 = to_cells(
        jnp.pad(
            jnp.where(v, jnp.inf, -jnp.inf).astype(jnp.float32),
            ((0, b_pad - B), (0, 0)),
            constant_values=-jnp.inf,
        )
    )
    first = jnp.pad(first, (0, b_pad - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3 * _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((rows, _SUBLANES, n8), lambda i, *_: (i, 0, 0)),
        ],
        # SMEM output covers the full array; programs index rows globally.
        out_specs=pl.BlockSpec((b_pad, num_samples), lambda i, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, _SUBLANES, n8), jnp.float32),
            pltpu.VMEM((_SUBLANES, n8), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _fps_kernel, num_samples=num_samples, n8=n8, rows=rows
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, num_samples), jnp.int32),
        interpret=interpret,
    )(first, xyz, mind0)
    return out[:B]
