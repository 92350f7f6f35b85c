"""Point-cloud tokenizer geometry (pure functions, no parameters).

The reference computes FPS centers + kNN indices inside ``torch.no_grad()``
within the patch-embed modules (reference: common.py:89-97,198-201,
pc_encoder.py:230-238). Here that geometry is factored out as pure functions
of the coordinates: it is non-differentiable, identical across click
iterations, reusable by the mask prompt encoder (which regroups onto the
*encoder's* centers, prompt_encoder.py:123-131), and — crucially for TPU —
it lets the serving path cache everything shape-static per point cloud.

All functions honor ``point_valid`` padding masks so that a single compiled
executable serves any N up to the bucket size (the reference instead
*reconfigures the grouper per scene*, eval_kitti.py:350-362).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import (
    batch_index_select,
    compute_interp_weights,
    fps,
    fps_with_interp,
    fps_with_interp_knn,
    knn,
    nn1,
)


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    """Grouping hyperparameters (reference configs/model/*.yaml:6-9).

    ``knn_method``: neighbor-search dispatch for the G x K tokenizer search
    ("auto" picks the TPU-optimized ``approx_min_k`` path for large clouds;
    "exact" forces the exact blocked scan — the A/B switch the evaluator
    exposes to measure what the approximation costs in mIoU).

    ``fps_candidates``: optional approximate FPS — sample centers from a
    strided ``fps_candidates``-point subset instead of the full cloud
    (ops.fps). None = exact (reference parity). The evaluator exposes the
    matching A/B switch.

    ``knn_recall_target``: per-neighbor recall target for the approx kNN
    path (ops.knn). Trades neighbor recall for encode latency (at
    G=2048 x N=100k x K=256 on v5e: 0.95 -> ~0.98 measured set recall,
    9.4 ms; 0.9 -> ~0.96, 4.1 ms). Default 0.9: the end-metric A/B
    (evalsuite/ab_approx.py, r2 run) measures mIoU-per-click deltas vs
    both exact kNN and rt=0.95 within +-0.008 (noise) on an overfit
    probe model — see PARITY.md "Approximation A/B"."""

    num_patches: int = 512
    patch_size: int = 64
    radius: float | None = None
    centralize_features: bool = False
    knn_method: str = "auto"
    fps_candidates: int | None = None
    knn_recall_target: float = 0.9


@dataclasses.dataclass(frozen=True)
class HierTokenizerConfig:
    num_patches: tuple[int, int] = (2048, 512)
    patch_size: tuple[int, int] = (32, 32)
    radius: tuple[float, float] | None = None


def compute_geometry(
    coords: jnp.ndarray,
    cfg: TokenizerConfig,
    *,
    point_valid: jnp.ndarray | None = None,
    with_interp: bool = True,
) -> dict:
    """FPS centers + per-center kNN + (optionally) 3-NN interp weights.

    Equivalent of the no-grad block of KNNGrouper.forward (common.py:89-97)
    plus the decoder's lazily cached interpolation weights
    (mask_decoder.py:151-156), computed eagerly since they are pure geometry.

    Returns dict(fps_idx [B,G], centers [B,G,3], knn_idx [B,G,K],
                 interp_index [B,N,3], interp_weight [B,N,3]).
    """
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    if with_interp:
        if cfg.fps_candidates is None and cfg.knn_method in ("auto", "approx"):
            # Whole-geometry fusion on TPU: FPS + centers + 3-NN interp +
            # the tokenizer k-NN all fall out of the selection loop's own
            # distance fields (ops.fps_with_interp_knn) — no [G, N]
            # matrix, no centers gather. Exact-kNN A/B runs (knn_method=
            # "exact") and high recall targets take the composed path.
            fused = fps_with_interp_knn(
                coords, cfg.num_patches, cfg.patch_size, valid=point_valid,
                recall_target=cfg.knn_recall_target)
            if fused is not None:
                fps_idx, centers, idx, w, knn_idx = fused
                return dict(fps_idx=fps_idx, centers=centers,
                            knn_idx=knn_idx, interp_index=idx,
                            interp_weight=w)
        # Fused on TPU: the FPS selection loop already computes every
        # center's distance field, so the 3-NN interp triplet falls out of
        # the same VMEM-resident pass (ops.fps_with_interp) instead of a
        # second [N, G] distance sweep. Centers come out of the kernel too:
        # a gathered kNN query fuses into the distance matmul with slow
        # row-major layouts (+1.8 ms at N=100k; kbench11/12).
        fps_idx, centers, idx, w = fps_with_interp(
            coords, cfg.num_patches, valid=point_valid,
            candidates=cfg.fps_candidates, with_centers=True)
    else:
        fps_idx = fps(coords, cfg.num_patches, valid=point_valid,
                      candidates=cfg.fps_candidates)
        centers = batch_index_select(coords, fps_idx, axis=1)
    _, knn_idx = knn(centers, coords, cfg.patch_size, key_valid=point_valid,
                     method=cfg.knn_method,
                     recall_target=cfg.knn_recall_target)
    out = dict(fps_idx=fps_idx, centers=centers, knn_idx=knn_idx)
    if with_interp:
        out["interp_index"], out["interp_weight"] = idx, w
    return out


def compute_geometry_voronoi(
    coords: jnp.ndarray,
    num_patches: int,
    *,
    point_valid: jnp.ndarray | None = None,
    with_interp: bool = True,
) -> dict:
    """FPS centers + per-point 1-NN center assignment (NNGrouper,
    common.py:198-201)."""
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    fps_idx = fps(coords, num_patches, valid=point_valid)
    centers = batch_index_select(coords, fps_idx, axis=1)
    _, nn_idx = nn1(coords, centers)
    # point_valid rides in the geometry so the scatter-max consumers can
    # exclude padded points (they must never win the per-cell max).
    out = dict(fps_idx=fps_idx, centers=centers, nn_idx=nn_idx,
               point_valid=point_valid)
    if with_interp:
        idx, w = compute_interp_weights(coords, centers)
        out["interp_index"], out["interp_weight"] = idx, w
    return out


def compute_geometry_hier(
    coords: jnp.ndarray,
    cfg: HierTokenizerConfig,
    *,
    point_valid: jnp.ndarray | None = None,
    with_interp: bool = True,
) -> dict:
    """Two-level geometry (PatchEmbedHier, pc_encoder.py:230-238): level 1
    groups the cloud; level 2 groups the level-1 centers, taking the first
    G2 of them as centers (``use_fps=False`` path, common.py:94-96)."""
    coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
    g1, g2 = cfg.num_patches
    k1, k2 = cfg.patch_size

    fps_idx1 = fps(coords, g1, valid=point_valid)
    centers1 = batch_index_select(coords, fps_idx1, axis=1)
    _, knn_idx1 = knn(centers1, coords, k1, key_valid=point_valid)

    centers2 = centers1[:, :g2]
    _, knn_idx2 = knn(centers2, centers1, k2)

    out = dict(
        fps_idx1=fps_idx1,
        centers1=centers1,
        knn_idx1=knn_idx1,
        centers2=centers2,
        knn_idx2=knn_idx2,
        # Aliases used by shared decoder code paths.
        centers=centers2,
    )
    if with_interp:
        idx21, w21 = compute_interp_weights(centers1, centers2)
        idx1n, w1n = compute_interp_weights(coords, centers1)
        out.update(
            interp_index_21=idx21,
            interp_weight_21=w21,
            interp_index=idx1n,
            interp_weight=w1n,
        )
    return out
