"""Point-axis-sharded geometry via shard_map + XLA collectives.

The reference has no sequence/context parallelism at all — long clouds are
*subsampled*, never sharded (SURVEY.md §2.4). The N-point stages of this
framework (kNN against the cloud, border-distance for the click simulator)
are embarrassingly parallel over keys, so on a multi-chip mesh they can
process clouds far beyond one chip's memory: each device holds a shard of
the points, computes its local result, and a single small collective
(all-gather of k candidates, or min-psum of distances) merges shards over
ICI.

FPS stays replicated (it is globally sequential); these helpers cover the
O(N^2)-ish stages that dominate at very large N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import ops


def sharded_knn(
    query: jnp.ndarray,
    key_sharded: jnp.ndarray,
    k: int,
    mesh: Mesh,
    *,
    axis: str = "data",
    method: str = "auto",
    recall_target: float = 0.95,
    key_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kNN with the key cloud sharded over a mesh axis.

    Args:
        query: [B, Nq, 3], replicated.
        key_sharded: [B, Nk, 3] with Nk sharded over ``axis`` (Nk divisible
            by the axis size).
        k: neighbors per query.
        key_valid: optional [B, Nk] bool, sharded like the keys; padded
            keys never win (the bucketed evaluator's padding contract).

    Returns: (sq_dists [B, Nq, k], global indices [B, Nq, k]) — identical
    (up to distance ties) to the single-device ops.knn result.
    """
    nk = key_sharded.shape[1]
    n_dev = mesh.shape[axis]
    shard = nk // n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=(P(), P()),
        # Replication of the merged result across the axis holds by
        # construction (identical all-gathered operands on every device) but
        # cannot be statically inferred.
        check_vma=False,
    )
    def f(q, key_local, valid_local):
        d_loc, i_loc = ops.knn(q, key_local, k, method=method,
                               recall_target=recall_target,
                               key_valid=valid_local)
        i_glob = i_loc + (jax.lax.axis_index(axis) * shard).astype(i_loc.dtype)
        # Gather every shard's k candidates and merge: one small collective
        # ([B, Nq, k * n_dev]) rides ICI; the merge is a local top-k.
        d_all = jax.lax.all_gather(d_loc, axis, axis=-1, tiled=True)
        i_all = jax.lax.all_gather(i_glob, axis, axis=-1, tiled=True)
        neg_d, sel = jax.lax.top_k(-d_all, k)
        return -neg_d, jnp.take_along_axis(i_all, sel, axis=-1)

    if key_valid is None:
        key_valid = jnp.ones(key_sharded.shape[:2], bool)
    return f(query, key_sharded, key_valid)


def sharded_min_sq_dist_to_complement(
    coords_sharded: jnp.ndarray,
    regions_sharded: jnp.ndarray,
    coords_full: jnp.ndarray,
    regions_full: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "data",
) -> jnp.ndarray:
    """Click-simulator border distances with points sharded over the mesh.

    Each device computes, for ITS shard of query points, the min distance
    to the complement across the FULL cloud by scanning the full
    (replicated) keys — queries are sharded, so compute and the [n_shard,
    tile] working set split across devices; results concatenate back with
    one all-gather.

    Args mirror ops.min_sq_dist_to_complement with coords/regions sharded
    on the point axis (queries) and replicated (keys).
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, axis), P(), P()),
        out_specs=P(None, None, axis),
    )
    def f(q_local, r_q_local, coords, regions):
        # For local query points: min over the full complement.
        from ..ops.distance import sq_dist

        comp = ~regions  # [B, R, N] full complement (replicated)
        d2 = sq_dist(q_local, coords)  # [B, n_local, N]
        out = []
        for r in range(regions.shape[1]):
            penal = jnp.where(comp[:, r], 0.0, jnp.inf)[:, None, :]
            out.append(jnp.min(d2 + penal, axis=-1))
        return jnp.stack(out, axis=1)  # [B, R, n_local]

    return f(coords_sharded, regions_sharded, coords_full, regions_full)
