"""Binned-min Pallas kNN kernel (interpret mode) vs exact kNN.

The kernel's contract is an approximate neighbor SET (sorted by distance)
with composite recall at least matching the stock approx_min_k path at the
same recall_target — see ops/knn_pallas.py. On-chip compile + recall floor
is asserted by tests/tpu_smoke.py::check_knn_binned.
"""

import numpy as np
import jax.numpy as jnp

from point_sam_tpu.ops.knn import knn
from point_sam_tpu.ops.knn_pallas import _choose_tiling, knn_binned_pallas


def _recall(idx, ref, k):
    idx, ref = np.asarray(idx), np.asarray(ref)
    b, g = idx.shape[:2]
    return np.mean([
        len(set(idx[i, j].tolist()) & set(ref[i, j].tolist())) / k
        for i in range(b) for j in range(g)
    ])


def test_tiling_bins_cover_target():
    for n, k, r in [(100_000, 256, 0.9), (9000, 16, 0.9), (32768, 64, 0.95)]:
        tile_n, n_tiles, n_pad = _choose_tiling(n, k, r)
        assert n_pad >= n
        assert tile_n % 128 == 0
        assert (tile_n // 128) & (tile_n // 128 - 1) == 0  # power of two
        assert n_tiles * tile_n == n_pad


def test_recall_and_distances(rng):
    B, G, N, K = 2, 48, 6000, 16
    q = jnp.asarray(rng.standard_normal((B, G, 3)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    d, i = knn_binned_pallas(q, kk, K, recall_target=0.9, interpret=True)
    de, ie = knn(q, kk, K, method="exact")
    assert _recall(i, ie, K) >= 0.9
    # returned distances match the gathered squared distances (expansion tol)
    kn = np.asarray(kk)
    gathered = np.take_along_axis(
        kn[:, None], np.asarray(i)[..., None], axis=2)
    dd = ((np.asarray(q)[:, :, None, :] - gathered) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), dd, atol=1e-4)
    # sorted ascending
    assert bool((np.diff(np.asarray(d), axis=-1) >= -1e-6).all())


def test_key_valid_never_selected(rng):
    B, G, N, K = 1, 32, 5000, 8
    q = jnp.asarray(rng.standard_normal((B, G, 3)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    kv = jnp.asarray(rng.random((B, N)) < 0.5)
    _, i = knn_binned_pallas(q, kk, K, key_valid=kv, recall_target=0.9,
                             interpret=True)
    sel = np.take_along_axis(
        np.broadcast_to(np.asarray(kv)[:, None, :], (B, G, N)),
        np.asarray(i), axis=-1)
    assert bool(sel.all())
