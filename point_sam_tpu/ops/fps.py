"""Farthest point sampling (FPS).

TPU-native replacement for the reference's CUDA
``torkit3d.ops.sample_farthest_points`` (declared reference .gitmodules:16-18,
used at pc_sam/model/common.py:91,199). Semantics characterized from the call
sites: iterative farthest-point selection over fp32 coordinates, returning
[B, G] indices, deterministic, starting from point 0.

FPS is inherently sequential in G, so the implementation is a
``lax.fori_loop`` over selection steps carrying the running min-distance
field [B, N]. Each step is one distance update + masked argmax — pure VPU
work that XLA keeps on-chip. A Pallas kernel (ops/fps_pallas.py) keeps
points + min-distances pinned in VMEM across all G steps for large N.

Padding contract: ``valid`` marks real points. Invalid points are never
selected (their min-distance is pinned to -inf); if G exceeds the number of
valid points the remaining slots repeat the last farthest point, which is
harmless downstream (duplicate centers produce duplicate tokens).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import sq_dist_to_point


@partial(jax.jit, static_argnames=("num_samples",))
def fps_xla(
    points: jnp.ndarray,
    num_samples: int,
    *,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sample ``num_samples`` farthest-point indices per batch row.

    Args:
        points: [B, N, 3] fp32 coordinates. (Distance math must be fp32 —
            the reference also casts to float for FPS, common.py:91.)
        num_samples: number of centers G (static).
        valid: optional [B, N] bool mask of real points.

    Returns:
        [B, G] int32 indices into N.
    """
    if points.dtype != jnp.float32:
        points = points.astype(jnp.float32)
    B, N, _ = points.shape
    G = num_samples

    neg_inf = jnp.float32(-jnp.inf)
    # Min squared distance from each point to the selected set so far.
    min_d = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    if valid is not None:
        min_d = jnp.where(valid, min_d, neg_inf)
        # Start from the first valid point per row.
        first = jnp.argmax(valid, axis=1).astype(jnp.int32)
    else:
        first = jnp.zeros((B,), dtype=jnp.int32)

    idx_out = jnp.zeros((B, G), dtype=jnp.int32)
    idx_out = idx_out.at[:, 0].set(first)

    def update(min_d, sel):
        center = jnp.take_along_axis(points, sel[:, None, None], axis=1)[:, 0]
        d = sq_dist_to_point(points, center)  # [B, N]
        return jnp.minimum(min_d, d)

    min_d = update(min_d, first)

    def body(g, carry):
        min_d, idx_out = carry
        sel = jnp.argmax(min_d, axis=1).astype(jnp.int32)
        idx_out = idx_out.at[:, g].set(sel)
        min_d = update(min_d, sel)
        return min_d, idx_out

    if G > 1:
        _, idx_out = jax.lax.fori_loop(1, G, body, (min_d, idx_out))
    return idx_out


def fps(
    points: jnp.ndarray,
    num_samples: int,
    *,
    valid: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
    candidates: int | None = None,
) -> jnp.ndarray:
    """Farthest point sampling with automatic kernel dispatch.

    Uses the Pallas VMEM-resident kernel on TPU when the per-row working set
    fits in VMEM; falls back to the XLA loop elsewhere (CPU tests, huge N).

    ``candidates``: optional APPROXIMATE mode — run FPS over a deterministic
    strided subset of ``candidates`` points instead of all N (indices are
    mapped back to the full cloud). FPS centers only need to *cover* the
    cloud (they seed kNN patches, reference common.py:89-97), and a strided
    subset of a permuted cloud is a uniform subsample, so coverage is
    near-identical while every kernel pass shrinks by N/candidates. The
    exactness A/B lives in evalsuite.eval_interactive (--fps-candidates);
    default None = exact, matching torkit3d's exact CUDA FPS.
    """
    N = points.shape[-2]
    if candidates is not None and N > candidates:
        if num_samples > candidates:
            raise ValueError(
                f"num_samples={num_samples} exceeds candidates={candidates}"
            )
        sub = jnp.floor(
            jnp.arange(candidates, dtype=jnp.float32) * (N / candidates)
        ).astype(jnp.int32)
        pts = jnp.take(points, sub, axis=-2)
        v = jnp.take(valid, sub, axis=-1) if valid is not None else None
        idx = fps(pts, num_samples, valid=v, use_pallas=use_pallas)
        return jnp.take(sub, idx)

    if use_pallas is None:
        n = points.shape[-2]
        use_pallas = (
            jax.default_backend() == "tpu"
            # Mosaic alignment: the SMEM index output tiles by 128 along G.
            and num_samples % 128 == 0
            # VMEM budget: coords + 2 distance fields, fp32.
            and n <= 600_000
            # Small problems are fine on the XLA loop; skip kernel limits.
            and n >= 4096
        )
    if use_pallas:
        try:
            from .fps_pallas import fps_pallas

            return fps_pallas(points, num_samples, valid=valid)
        except Exception as exc:  # pragma: no cover - exercised on Mosaic regressions
            from ._warn import warn_fallback

            warn_fallback("ops.fps", exc)
    return fps_xla(points, num_samples, valid=valid)


def fps_with_interp(
    points: jnp.ndarray,
    num_samples: int,
    *,
    valid: jnp.ndarray | None = None,
    candidates: int | None = None,
    with_centers: bool = False,
    eps: float = 1e-8,
):
    """FPS + 3-NN interpolation geometry, fused into one kernel when possible.

    The FPS selection loop computes every selected center's distance to
    every point — exactly the [G, N] matrix the decoder's 3-NN interp
    weights need (reference mask_decoder.py:147-163) — so on TPU the fused
    Pallas kernel (ops/fps_pallas.fps_interp_pallas) emits both from one
    VMEM-resident pass, replacing the separate interp distance sweep.

    Falls back to the two-pass path (``fps`` + ``compute_interp_weights``)
    off-TPU, for approximate-FPS runs (``candidates`` restricts the
    selection loop to a subset, so its distance fields no longer cover the
    full cloud), and on any kernel failure.

    With ``with_centers`` the selected centers [B, G, 3] are returned as
    the second element. On the fused TPU path they come out of the KERNEL
    (bit-equal to a gather) — consuming them keeps XLA from fusing a
    gathered kNN query into the distance matmul with slow row-major
    layouts (+1.8 ms at the eval shape; kbench11/12).

    Returns:
        (fps_idx [B, G] int32, interp_idx [B, N, 3] int32,
         interp_weight [B, N, 3] fp32) — with ``with_centers``:
        (fps_idx, centers [B, G, 3] f32, interp_idx, interp_weight).
    """
    N = points.shape[-2]
    fused_ok = (
        candidates is None
        and jax.default_backend() == "tpu"
        and num_samples % 128 == 0
        and num_samples >= 3
        and 4096 <= N <= 400_000  # fused per-row VMEM set is 2.2x fps_pallas's
    )
    if fused_ok:
        try:
            from .fps_pallas import fps_interp_pallas

            if with_centers:
                fps_idx, centers, idx, d2 = fps_interp_pallas(
                    points, num_samples, valid=valid, with_centers=True
                )
            else:
                fps_idx, idx, d2 = fps_interp_pallas(
                    points, num_samples, valid=valid
                )
            inv = 1.0 / jnp.maximum(d2, eps)
            weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
            if with_centers:
                return fps_idx, centers, idx, weight
            return fps_idx, idx, weight
        except Exception as exc:  # pragma: no cover - Mosaic regressions
            from ._warn import warn_fallback

            warn_fallback("ops.fps_with_interp", exc)
    from .interp import compute_interp_weights

    fps_idx = fps(points, num_samples, valid=valid, candidates=candidates)
    centers = jnp.take_along_axis(points, fps_idx[..., None], axis=1)
    idx, weight = compute_interp_weights(points, centers, eps=eps)
    if with_centers:
        return fps_idx, centers, idx, weight
    return fps_idx, idx, weight


def fps_with_interp_knn(
    points: jnp.ndarray,
    num_samples: int,
    k: int,
    *,
    valid: jnp.ndarray | None = None,
    recall_target: float = 0.9,
    eps: float = 1e-8,
):
    """Whole-geometry fusion: FPS + centers + 3-NN interp + tokenizer k-NN
    from ONE VMEM-resident Pallas pass, or ``None`` when not applicable.

    Replaces the ``fps_with_interp`` + ``batch_index_select`` + ``knn``
    composition of models/tokenizer.compute_geometry on the TPU eval/serving
    path. Two measured costs disappear (scripts/kbench1{0,1,2}.py, B=1
    N=100k G=2048 K=256 on v5e):

    * the approx-kNN distance matrix round-trip: ``lax.approx_min_k`` is a
      custom call, so XLA materializes the [G, N] fp32 matrix (819 MB)
      through HBM twice — ~2.1 ms of pure bandwidth;
    * the centers-gather layout pessimization: the gathered query fuses
      into the distance matmul with row-major operand layouts, +1.8 ms vs
      a sliced query.

    The kernel's bin count (8 * 512 = 4096) gives expected top-k recall
    ~= 1 - (k-1)/(2*4096) ~= 0.97 at k=256 — above the approx path's
    measured 0.96 at the rt=0.9 operating point — so the gate requires
    ``recall_target <= 0.93``; exact-kNN A/B runs (recall_target higher or
    method="exact") take the unfused path.

    Returns ``(fps_idx, centers, interp_idx, interp_weight, knn_idx)`` or
    ``None`` (caller falls back to the composed path).

    DISABLED BY DEFAULT (opt-in: env PSAM_FUSED_GEOM=1). On-chip r5
    measurement (scripts/kbench13.py, v5e): fused 13.73 ms vs composed
    7.19 ms at the flagship shape — the per-step 25-chunk bin fold plus
    the [G, 4096] top_k tail cost more than the two HBM round-trips they
    remove. Numerics are fully validated (tests + tpu_smoke recall 0.970);
    revisit if the fold is restructured (fewer chunks / cheaper carry).
    """
    import os

    B, N, _ = points.shape
    fused_ok = (
        os.environ.get("PSAM_FUSED_GEOM", "0") == "1"
        and jax.default_backend() == "tpu"
        and B == 1  # candidate buffers are 67 MB of VMEM per program
        and num_samples % 128 == 0
        and 3 <= num_samples <= 2048
        and 16_384 <= N <= 400_000
        and 4 < k <= 1024
        and recall_target <= 0.93
    )
    if not fused_ok:
        return None
    try:
        from .fps_pallas import fps_interp_knn_pallas

        fps_idx, centers, idx, d2, knn_idx = fps_interp_knn_pallas(
            points, num_samples, k, valid=valid
        )
    except Exception as exc:  # pragma: no cover - Mosaic regressions
        from ._warn import warn_fallback

        warn_fallback("ops.fps_with_interp_knn", exc)
        return None
    inv = 1.0 / jnp.maximum(d2, eps)
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return fps_idx, centers, idx, weight, knn_idx


def fps_gather(
    points: jnp.ndarray, num_samples: int, *, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """FPS returning the sampled coordinates, like the reference's ``fps``
    wrapper (common.py:12-24)."""
    idx = fps(points, num_samples, valid=valid)
    return jnp.take_along_axis(points, idx[..., None], axis=1)
