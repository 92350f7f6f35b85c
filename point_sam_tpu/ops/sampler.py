"""Device-side click simulator (training/eval prompt sampling).

This replaces the reference's host-side prompt sampler — Python
``for i in B for j in M`` loops over ``torch.nonzero`` + CUDA chamfer calls
(reference: pc_sam/model/common.py:287-474) — with fully batched,
fixed-shape masked reductions that run inside the jitted step. This was the
reference's single worst host-sync stage (SURVEY.md §3.1).

Selection rule (matching ``sample_fixed_points``, common.py:368-474):
the new click is the point of the error region that is *farthest from the
region border*, where "distance to border" is the min distance from a region
point to any point of the region's complement (the reference computes this
with a one-directional chamfer, common.py:466-474):

- First click (no previous logits): region = the GT mask; label = 1.
- Later clicks: compute the farthest-from-border candidate of both the
  false-negative region (positive click) and the false-positive region
  (negative click), and take whichever lies deeper inside its region
  (common.py:415-440). If neither region exists, fall back to the GT mask
  (common.py:430-437).

Note on the adapter (common.py:287-316): the reference falls back to
*random* sampling only when the whole-batch IoU is exactly 1.0 and not in
eval — a practically dead path (any imperfect point keeps IoU < 1). We bind
the adapter to the fixed sampler unconditionally; ``sample_prompts_random``
is provided separately for API completeness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import sq_dist

# Plain python float, NOT jnp.float32(...): a module-level jnp scalar
# would initialize the JAX backend (i.e. open the TPU client) at import
# time, before entry points get a chance to force the CPU platform.
_INF = float("inf")


def min_sq_dist_to_complement(
    coords: jnp.ndarray,
    regions: jnp.ndarray,
    *,
    point_valid: jnp.ndarray | None = None,
    key_tile: int = 2048,
) -> jnp.ndarray:
    """For every point, min squared distance to the region's complement.

    Batched equivalent of the reference's one-directional chamfer from
    region points to their complement (common.py:466). Points outside the
    region get a well-defined value too (callers mask them out).

    Args:
        coords: [B, N, 3] fp32.
        regions: [B, R, N] bool. R region masks per cloud.
        point_valid: optional [B, N] bool; invalid points belong to neither
            region nor complement.
        key_tile: tile size over the "complement" (key) axis.

    Returns:
        [B, R, N] fp32: min_j { d2(i, j) : complement[j] }, +inf where the
        complement is empty.
    """
    B, N, _ = coords.shape
    R = regions.shape[1]
    num_tiles = -(-N // key_tile)
    pad = num_tiles * key_tile - N

    comp = ~regions  # [B, R, N]
    if point_valid is not None:
        comp = comp & point_valid[:, None, :]

    key_pts = coords
    if pad:
        key_pts = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
        comp = jnp.pad(comp, ((0, 0), (0, 0), (0, pad)))

    key_tiles = jnp.moveaxis(
        key_pts.reshape(B, num_tiles, key_tile, 3), 1, 0
    )  # [T, B, tile, 3]
    comp_tiles = jnp.moveaxis(
        comp.reshape(B, R, num_tiles, key_tile), 2, 0
    )  # [T, B, R, tile]

    init = jnp.full((B, R, N), _INF, dtype=jnp.float32)

    def body(dmin, tile):
        key_t, comp_t = tile
        d2 = sq_dist(coords, key_t)  # [B, N, tile]
        # Per-region masked min over the tile. R is small (3 * num_masks);
        # the python loop unrolls and XLA fuses the masked reductions.
        updates = []
        for r in range(R):
            penal = jnp.where(comp_t[:, r], 0.0, _INF)[:, None, :]  # [B,1,tile]
            updates.append(jnp.min(d2 + penal, axis=-1))  # [B, N]
        return jnp.minimum(dmin, jnp.stack(updates, axis=1)), None

    dmin, _ = jax.lax.scan(body, init, (key_tiles, comp_tiles))
    return dmin


def _farthest_in_region(dmin_row, region):
    """Masked argmax of border distance within a region.

    Returns (score, idx): score = -inf when the region or its complement is
    empty (the reference's -1 sentinel, common.py:461-463).
    """
    masked = jnp.where(region, dmin_row, -_INF)
    idx = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    score = jnp.max(masked, axis=-1)
    # Empty complement => dmin stayed +inf; empty region => score is -inf.
    score = jnp.where(jnp.isfinite(score), score, -_INF)
    return score, idx


@partial(jax.jit, static_argnames=("key_tile",))
def sample_prompts(
    coords: jnp.ndarray,
    gt_masks: jnp.ndarray,
    pred_logits: jnp.ndarray | None = None,
    *,
    point_valid: jnp.ndarray | None = None,
    key_tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample one new click per (cloud, mask), farthest-from-border rule.

    Args:
        coords: [B, N, 3] fp32 coordinates.
        gt_masks: [B, M, N] bool ground-truth masks.
        pred_logits: optional [B*M, N] previous mask logits (pre-sigmoid;
            prediction = logits > 0, matching threshold=None in the
            reference, common.py:397-400).
        point_valid: optional [B, N] bool padding mask.

    Returns:
        (prompt_coords [B*M, 1, 3], prompt_labels [B*M, 1] bool).
    """
    B, M, N = gt_masks.shape

    if pred_logits is None:
        # First click: region = gt, label positive (common.py:296-299,391-393
        # with from_error_region=True => mask = fn|fp = gt).
        dmin = min_sq_dist_to_complement(
            coords, gt_masks, point_valid=point_valid, key_tile=key_tile
        )  # [B, M, N]
        flat_region = gt_masks.reshape(B * M, N)
        score, idx = _farthest_in_region(dmin.reshape(B * M, N), flat_region)
        sel_idx = idx
    else:
        pred = pred_logits.reshape(B, M, N) > 0
        fn = gt_masks & ~pred
        fp = ~gt_masks & pred
        if point_valid is not None:
            pv = point_valid[:, None, :]
            fn, fp = fn & pv, fp & pv
            gt_eff = gt_masks & pv
        else:
            gt_eff = gt_masks
        regions = jnp.concatenate([fn, fp, gt_eff], axis=1)  # [B, 3M, N]
        dmin = min_sq_dist_to_complement(
            coords, regions, point_valid=point_valid, key_tile=key_tile
        )
        d_fn, d_fp, d_gt = jnp.split(dmin, 3, axis=1)  # each [B, M, N]
        r_fn, r_fp, r_gt = fn, fp, gt_eff

        p_score, p_idx = _farthest_in_region(
            d_fn.reshape(B * M, N), r_fn.reshape(B * M, N)
        )
        n_score, n_idx = _farthest_in_region(
            d_fp.reshape(B * M, N), r_fp.reshape(B * M, N)
        )
        g_score, g_idx = _farthest_in_region(
            d_gt.reshape(B * M, N), r_gt.reshape(B * M, N)
        )
        del g_score

        # Decision tree of common.py:427-440 with -inf as the -1 sentinel:
        # pdist > ndist -> positive; elif ndist invalid -> gt fallback;
        # else -> negative.
        take_pos = p_score > n_score
        n_invalid = jnp.isneginf(n_score)
        sel_idx = jnp.where(take_pos, p_idx, jnp.where(n_invalid, g_idx, n_idx))

    # coords per row of B*M: row b*M+m uses cloud b.
    coords_bm = jnp.repeat(coords, M, axis=0)
    prompt_coords = jnp.take_along_axis(
        coords_bm, sel_idx[:, None, None], axis=1
    )  # [B*M, 1, 3]
    gt_flat = gt_masks.reshape(B * M, N)
    prompt_labels = jnp.take_along_axis(gt_flat, sel_idx[:, None], axis=1)  # [B*M,1]
    return prompt_coords, prompt_labels


def sample_prompts_random(
    rng: jax.Array,
    coords: jnp.ndarray,
    gt_masks: jnp.ndarray,
    pred_logits: jnp.ndarray | None = None,
    *,
    point_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform-random click in the error region (reference common.py:319-365).

    Kept for API completeness; the training adapter uses the fixed
    farthest-from-border sampler (see module docstring). Fixed-shape trick:
    random point = masked argmax over iid gumbel noise. ``point_valid``
    excludes padded points from both the error region and the fallback.
    """
    B, M, N = gt_masks.shape
    if pred_logits is None:
        diff = gt_masks
    else:
        pred = pred_logits.reshape(B, M, N) > 0
        diff = gt_masks != pred
    gt_eff = gt_masks
    if point_valid is not None:
        pv = point_valid[:, None, :]
        diff = diff & pv
        gt_eff = gt_masks & pv
    # Fall back to the gt mask when the error region is empty
    # (common.py:356-357).
    empty = ~jnp.any(diff, axis=-1, keepdims=True)
    diff = jnp.where(empty, gt_eff, diff)

    noise = jax.random.gumbel(rng, (B, M, N))
    sel = jnp.argmax(jnp.where(diff, noise, -_INF), axis=-1)  # [B, M]
    sel_idx = sel.reshape(B * M).astype(jnp.int32)

    coords_bm = jnp.repeat(coords, M, axis=0)
    prompt_coords = jnp.take_along_axis(coords_bm, sel_idx[:, None, None], axis=1)
    gt_flat = gt_masks.reshape(B * M, N)
    prompt_labels = jnp.take_along_axis(gt_flat, sel_idx[:, None], axis=1)
    return prompt_coords, prompt_labels
