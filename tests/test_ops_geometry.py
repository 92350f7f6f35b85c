"""Unit tests for the geometry kernel library vs NumPy brute force.

Mirrors the test strategy recommended in SURVEY.md §4(a): FPS
monotone-farthest invariant, kNN vs brute force, interpolation weights
sum to 1, gathers vs fancy indexing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from point_sam_tpu import ops


def brute_knn(query, key, k):
    d = ((query[:, :, None, :] - key[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1)[..., :k]
    return np.take_along_axis(d, idx, axis=-1), idx


class TestSqDist:
    def test_matches_numpy(self, rng):
        q = rng.standard_normal((2, 17, 3), dtype=np.float32)
        k = rng.standard_normal((2, 23, 3), dtype=np.float32)
        got = np.asarray(ops.sq_dist(jnp.asarray(q), jnp.asarray(k)))
        want = ((q[:, :, None, :] - k[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestKNN:
    @pytest.mark.parametrize("nk,tile", [(100, 4096), (300, 64), (257, 100)])
    def test_matches_brute_force(self, rng, nk, tile):
        q = rng.standard_normal((2, 31, 3), dtype=np.float32)
        k = rng.standard_normal((2, nk, 3), dtype=np.float32)
        d, i = ops.knn(jnp.asarray(q), jnp.asarray(k), 5, key_tile=tile, dense_max=128)
        want_d, want_i = brute_knn(q, k, 5)
        np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-4)
        # Indices can differ under distance ties; compare distances of picks.
        picked = np.take_along_axis(
            ((q[:, :, None, :] - k[:, None, :, :]) ** 2).sum(-1),
            np.asarray(i),
            axis=-1,
        )
        np.testing.assert_allclose(picked, want_d, atol=1e-4)

    def test_key_valid_mask_excludes_padding(self, rng):
        k = rng.standard_normal((1, 64, 3), dtype=np.float32)
        # Put poison points extremely close to the queries but mark invalid.
        q = rng.standard_normal((1, 8, 3), dtype=np.float32)
        k[0, :8] = q[0] + 1e-4
        valid = np.ones((1, 64), bool)
        valid[0, :8] = False
        _, i = ops.knn(jnp.asarray(q), jnp.asarray(k), 3, key_valid=jnp.asarray(valid))
        assert (np.asarray(i) >= 8).all()

    def test_bf16_distance_combination_stays_fp32(self, rng):
        """Guard for a retired design: the approx path once streamed bf16
        matmul inputs (now pure fp32 — bf16 bought zero speedup, see
        ops/knn.py::_approx_knn docstring). If bf16 inputs ever return, the
        q^2-2qk+k^2 combination must STAY fp32: bf16 arithmetic there loses
        ~4e-3 absolute to cancellation — larger than nearest-neighbor
        squared distances on clustered scenes, where the full-bf16 model's
        top-K set recall collapsed to ~0.39 (round-3 measurement). This
        test bit-emulates the mixed model on a clustered cloud and asserts
        it stays near exact (the floor any bf16 revival must clear)."""
        N, G, K = 20_000, 64, 128
        centers = rng.standard_normal((32, 3)).astype(np.float32) * 0.5
        pts = centers[rng.integers(0, 32, N)] + \
            rng.standard_normal((N, 3)).astype(np.float32) * 0.02
        pts /= np.abs(pts).max()
        q32 = jnp.asarray(pts[rng.choice(N, G, replace=False)])
        k32 = jnp.asarray(pts)
        qb, kb = q32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16)

        d_ref = np.asarray(ops.sq_dist(q32, k32))
        # the kernel's mixed model (ops/knn.py::_approx_knn dist)
        q2 = jnp.sum(jnp.square(qb.astype(jnp.float32)), -1, keepdims=True)
        k2 = jnp.sum(jnp.square(kb.astype(jnp.float32)), -1, keepdims=True)
        qk = jnp.einsum("nd,md->nm", qb, kb,
                        preferred_element_type=jnp.float32)
        d_mixed = np.asarray(jnp.maximum(q2 - 2.0 * qk + k2.T, 0.0))

        ref_i = np.argsort(d_ref, axis=-1)[:, :K]
        mix_i = np.argsort(d_mixed, axis=-1)[:, :K]
        recall = np.mean([
            len(np.intersect1d(ref_i[g], mix_i[g])) / K for g in range(G)
        ])
        assert recall >= 0.93, recall

    def test_blocked_equals_dense(self, rng):
        q = rng.standard_normal((2, 16, 3), dtype=np.float32)
        k = rng.standard_normal((2, 500, 3), dtype=np.float32)
        d1, _ = ops.knn(jnp.asarray(q), jnp.asarray(k), 4, dense_max=8192)
        d2, _ = ops.knn(jnp.asarray(q), jnp.asarray(k), 4, dense_max=1, key_tile=128)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_small_k_matches_exact(self, rng):
        q = rng.standard_normal((2, 500, 3), dtype=np.float32)
        k = rng.standard_normal((2, 300, 3), dtype=np.float32)
        d1, i1 = ops.knn(jnp.asarray(q), jnp.asarray(k), 3, method="exact")
        d2, i2 = ops.knn(jnp.asarray(q), jnp.asarray(k), 3, method="small_k")
        np.testing.assert_allclose(np.asarray(jnp.sort(d1, -1)),
                                   np.asarray(jnp.sort(d2, -1)), atol=1e-5)
        assert (np.sort(np.asarray(i1), -1) == np.sort(np.asarray(i2), -1)).all()

    def test_small_k_query_tiling(self, rng):
        # Nq not a multiple of the tile size exercises the padding path.
        q = rng.standard_normal((1, 100, 3), dtype=np.float32)
        k = rng.standard_normal((1, 64, 3), dtype=np.float32)
        from point_sam_tpu.ops.knn import _small_k_knn

        d, i = _small_k_knn(jnp.asarray(q), jnp.asarray(k), 3, None,
                            query_tile=32)
        want_d, _ = brute_knn(q, k, 3)
        np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-5)

    def test_small_k_respects_key_valid(self, rng):
        q = rng.standard_normal((1, 8, 3), dtype=np.float32)
        k = np.concatenate([q + 1e-4, rng.standard_normal((1, 56, 3),
                                                          dtype=np.float32)], 1)
        valid = np.ones((1, 64), bool)
        valid[0, :8] = False
        _, i = ops.knn(jnp.asarray(q), jnp.asarray(k), 2, method="small_k",
                       key_valid=jnp.asarray(valid))
        assert (np.asarray(i) >= 8).all()

    def test_approx_recall(self, rng):
        """The approx path must find ~all true neighbors (recall >= 0.95
        at target 0.99) — it backs the tokenizer at large N."""
        q = rng.standard_normal((1, 64, 3), dtype=np.float32)
        k = rng.standard_normal((1, 20000, 3), dtype=np.float32)
        _, ia = ops.knn(jnp.asarray(q), jnp.asarray(k), 32, method="approx")
        _, ie = ops.knn(jnp.asarray(q), jnp.asarray(k), 32, method="exact",
                        dense_max=32768)
        ia, ie = np.asarray(ia), np.asarray(ie)
        recalls = [
            len(set(ia[0, i]) & set(ie[0, i])) / 32 for i in range(64)
        ]
        assert np.mean(recalls) > 0.95, np.mean(recalls)

    def test_nn1(self, rng):
        q = rng.standard_normal((2, 10, 3), dtype=np.float32)
        k = rng.standard_normal((2, 50, 3), dtype=np.float32)
        d, i = ops.nn1(jnp.asarray(q), jnp.asarray(k))
        want_d, want_i = brute_knn(q, k, 1)
        np.testing.assert_allclose(np.asarray(d), want_d[..., 0], atol=1e-5)
        assert (np.asarray(i) == want_i[..., 0]).all()


def brute_fps(points, g):
    """Reference NumPy FPS starting at index 0."""
    n = points.shape[0]
    idx = np.zeros(g, dtype=np.int64)
    mind = ((points - points[0]) ** 2).sum(-1)
    for s in range(1, g):
        idx[s] = np.argmax(mind)
        mind = np.minimum(mind, ((points - points[idx[s]]) ** 2).sum(-1))
    return idx


class TestFPS:
    def test_matches_numpy(self, rng):
        pts = rng.standard_normal((2, 200, 3), dtype=np.float32)
        got = np.asarray(ops.fps_xla(jnp.asarray(pts), 16))
        for b in range(2):
            want = brute_fps(pts[b], 16)
            assert (got[b] == want).all(), (got[b], want)

    def test_monotone_farthest_invariant(self, rng):
        """Each newly selected point is at least as far from the selected set
        as every later selection is at its own step (greedy max property):
        the sequence of selection distances is non-increasing."""
        pts = rng.standard_normal((1, 500, 3), dtype=np.float32)
        idx = np.asarray(ops.fps_xla(jnp.asarray(pts), 32))[0]
        sel = pts[0][idx]
        dists = []
        for s in range(1, 32):
            d = ((sel[s] - sel[:s]) ** 2).sum(-1).min()
            dists.append(d)
        assert all(a >= b - 1e-5 for a, b in zip(dists[:-1], dists[1:]))

    def test_valid_mask(self, rng):
        pts = rng.standard_normal((1, 100, 3), dtype=np.float32)
        pts[0, 50:] = 100.0  # far-away padding that would otherwise win
        valid = np.arange(100) < 50
        idx = np.asarray(ops.fps_xla(jnp.asarray(pts), 10, valid=jnp.asarray(valid[None])))
        assert (idx < 50).all()

    def test_pallas_kernel_bit_exact(self, rng):
        from point_sam_tpu.ops.fps_pallas import fps_pallas

        pts = rng.standard_normal((2, 1500, 3)).astype(np.float32)
        want = np.asarray(ops.fps_xla(jnp.asarray(pts), 64))
        got = np.asarray(fps_pallas(jnp.asarray(pts), 64, interpret=True))
        assert (want == got).all()

    def test_pallas_kernel_valid_mask(self, rng):
        from point_sam_tpu.ops.fps_pallas import fps_pallas

        pts = rng.standard_normal((2, 1500, 3)).astype(np.float32)
        valid = np.ones((2, 1500), bool)
        valid[:, 1000:] = False
        want = np.asarray(ops.fps_xla(jnp.asarray(pts), 32,
                                      valid=jnp.asarray(valid)))
        got = np.asarray(fps_pallas(jnp.asarray(pts), 32,
                                    valid=jnp.asarray(valid), interpret=True))
        assert (want == got).all()
        assert (got < 1000).all()

    def test_pallas_kernel_tie_breaking(self, rng):
        """Duplicated points force exact distance ties; the kernel's
        hierarchical argmax must still pick the smallest index."""
        from point_sam_tpu.ops.fps_pallas import fps_pallas

        base = rng.standard_normal((1, 300, 3)).astype(np.float32)
        pts = jnp.asarray(np.tile(base, (1, 2, 1)))
        want = np.asarray(ops.fps_xla(pts, 48))
        got = np.asarray(fps_pallas(pts, 48, interpret=True))
        assert (want == got).all()

    def test_no_duplicates_when_enough_points(self, rng):
        pts = rng.standard_normal((3, 64, 3), dtype=np.float32)
        idx = np.asarray(ops.fps_xla(jnp.asarray(pts), 32))
        for b in range(3):
            assert len(set(idx[b].tolist())) == 32

    def _check_fps_interp(self, pts, G, valid=None):
        """Fused kernel vs (fps_xla, interp_weights_pallas): selection must
        be bit-exact; the 3-NN triplet must match the dedicated interp
        kernel (identical explicit-difference fp32 distance formula)."""
        from point_sam_tpu.ops.fps_pallas import fps_interp_pallas
        from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

        pts = jnp.asarray(pts)
        v = None if valid is None else jnp.asarray(valid)
        fps_idx, idx, d2 = fps_interp_pallas(pts, G, valid=v, interpret=True)
        want_fps = np.asarray(ops.fps_xla(pts, G, valid=v))
        assert (np.asarray(fps_idx) == want_fps).all()

        centers = np.take_along_axis(
            np.asarray(pts), want_fps[..., None], axis=1
        )
        want_idx, want_w = interp_weights_pallas(
            pts, jnp.asarray(centers), tile_q=128, interpret=True
        )
        assert (np.asarray(idx) == np.asarray(want_idx)).all()
        inv = 1.0 / np.maximum(np.asarray(d2), 1e-8)
        w = inv / inv.sum(-1, keepdims=True)
        np.testing.assert_allclose(w, np.asarray(want_w), rtol=1e-6, atol=1e-7)

        # with_centers: the kernel's blend-stored centers must be BIT-equal
        # to gathering the points at fps_idx, and the other outputs must be
        # unchanged.
        fps2, ctr, idx2, d22 = fps_interp_pallas(
            pts, G, valid=v, with_centers=True, interpret=True
        )
        assert (np.asarray(fps2) == want_fps).all()
        np.testing.assert_array_equal(np.asarray(ctr), centers)
        assert (np.asarray(idx2) == np.asarray(want_idx)).all()
        np.testing.assert_array_equal(np.asarray(d22), np.asarray(d2))

    def test_fps_interp_pallas_matches(self, rng):
        self._check_fps_interp(
            rng.standard_normal((2, 1500, 3)).astype(np.float32), 128
        )

    def test_fps_interp_pallas_valid_mask(self, rng):
        pts = rng.standard_normal((2, 1500, 3)).astype(np.float32)
        valid = np.ones((2, 1500), bool)
        valid[:, 1000:] = False
        # Padded points still get interp triplets (downstream masks them);
        # only the CENTERS (all drawn from valid points) matter here.
        self._check_fps_interp(pts, 128, valid=valid)

    def test_fps_interp_pallas_ties(self, rng):
        """Duplicate points force exact distance ties in both the FPS
        argmax and the 3-NN insertion ordering."""
        base = rng.standard_normal((1, 700, 3)).astype(np.float32)
        self._check_fps_interp(np.tile(base, (1, 2, 1)), 128)

    def _check_fps_interp_knn(self, pts, G, k, valid=None, l_lanes=512,
                              exact=True):
        """Whole-geometry fused kernel: selection + centers + interp must be
        bit-exact vs the dedicated kernels; the binned kNN is EXACT whenever
        every point has its own bin (N_pad <= 8 * l_lanes)."""
        from point_sam_tpu.ops.fps_pallas import (
            fps_interp_knn_pallas,
            fps_interp_pallas,
        )

        pts = jnp.asarray(pts)
        v = None if valid is None else jnp.asarray(valid)
        fps_idx, ctr, idx, d2, knn_idx = fps_interp_knn_pallas(
            pts, G, k, valid=v, l_lanes=l_lanes, interpret=True
        )
        want_fps, want_idx, want_d2 = fps_interp_pallas(
            pts, G, valid=v, interpret=True
        )
        assert (np.asarray(fps_idx) == np.asarray(want_fps)).all()
        want_ctr = np.take_along_axis(
            np.asarray(pts), np.asarray(want_fps)[..., None], axis=1
        )
        np.testing.assert_array_equal(np.asarray(ctr), want_ctr)
        assert (np.asarray(idx) == np.asarray(want_idx)).all()
        np.testing.assert_array_equal(np.asarray(d2), np.asarray(want_d2))

        # kNN check vs brute force over VALID keys only.
        p = np.asarray(pts)
        B, N, _ = p.shape
        vmask = np.ones((B, N), bool) if valid is None else np.asarray(valid)
        got = np.asarray(knn_idx)
        n_valid = vmask.sum(-1)
        for b in range(B):
            d = ((want_ctr[b][:, None] - p[b][None]) ** 2).sum(-1)
            d[:, ~vmask[b]] = np.inf
            kb = min(k, int(n_valid[b]))
            want_sorted = np.sort(d, axis=-1)[:, :kb]
            picked = np.take_along_axis(d, got[b], axis=-1)
            assert (got[b] >= 0).all() and (got[b] < N).all()
            if exact:
                np.testing.assert_allclose(picked[:, :kb], want_sorted,
                                           rtol=0, atol=0)
            else:
                # Approx: ascending order + recall floor.
                assert (np.diff(picked, axis=-1) >= 0).all()
                recall = np.mean(picked[:, :kb] <= want_sorted[:, -1:] + 0)
                assert recall > 0.9

    def test_fps_interp_knn_exact_small(self, rng):
        # N_pad = 4096 = 8 * 512 bins -> one point per bin, exact kNN.
        self._check_fps_interp_knn(
            rng.standard_normal((1, 1500, 3)).astype(np.float32), 128, 16
        )

    def test_fps_interp_knn_valid_mask(self, rng):
        pts = rng.standard_normal((1, 1500, 3)).astype(np.float32)
        valid = np.ones((1, 1500), bool)
        valid[:, 1100:] = False
        self._check_fps_interp_knn(pts, 128, 16, valid=valid)

    def test_fps_interp_knn_binned(self, rng):
        # l_lanes=128 -> n_pad=2048, n8=256, chunks=2: exercises the fold.
        self._check_fps_interp_knn(
            rng.standard_normal((1, 1800, 3)).astype(np.float32),
            128, 16, l_lanes=128, exact=False,
        )

    def test_fps_interp_knn_ties(self, rng):
        base = rng.standard_normal((1, 700, 3)).astype(np.float32)
        self._check_fps_interp_knn(np.tile(base, (1, 2, 1)), 128, 8)

    def test_fps_with_interp_fallback_cpu(self, rng):
        """Off-TPU the wrapper takes the two-pass path; semantics match."""
        pts = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        fps_idx, idx, w = ops.fps_with_interp(pts, 64)
        want_fps = np.asarray(ops.fps(pts, 64))
        assert (np.asarray(fps_idx) == want_fps).all()
        centers = jnp.take_along_axis(pts, jnp.asarray(want_fps)[..., None],
                                      axis=1)
        want_idx, want_w = ops.compute_interp_weights(pts, centers)
        assert (np.asarray(idx) == np.asarray(want_idx)).all()
        np.testing.assert_allclose(np.asarray(w), np.asarray(want_w),
                                   rtol=1e-6)


class TestGroup:
    def test_batch_index_select(self, rng):
        x = rng.standard_normal((2, 10, 4), dtype=np.float32)
        idx = rng.integers(0, 10, (2, 5, 3))
        got = np.asarray(ops.batch_index_select(jnp.asarray(x), jnp.asarray(idx)))
        want = np.stack([x[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group_points_matches_manual(self, rng):
        B, N, G, K, C = 2, 50, 8, 4, 5
        xyz = rng.standard_normal((B, N, 3), dtype=np.float32)
        feats = rng.standard_normal((B, N, C), dtype=np.float32)
        centers = xyz[:, :G]
        _, knn_idx = ops.knn(jnp.asarray(centers), jnp.asarray(xyz), K)
        got = np.asarray(
            ops.group_points(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(centers), knn_idx
            )
        )
        ki = np.asarray(knn_idx)
        for b in range(B):
            for g in range(G):
                np.testing.assert_allclose(
                    got[b, g, :, :3], xyz[b][ki[b, g]] - centers[b, g], atol=1e-6
                )
                np.testing.assert_array_equal(got[b, g, :, 3:], feats[b][ki[b, g]])

    def test_group_points_repeats_and_radius(self, rng):
        B, M, N, G, K = 1, 3, 30, 4, 4
        xyz = rng.standard_normal((B, N, 3), dtype=np.float32)
        feats = rng.standard_normal((B * M, N, 1), dtype=np.float32)
        centers = xyz[:, :G]
        _, knn_idx = ops.knn(jnp.asarray(centers), jnp.asarray(xyz), K)
        got = np.asarray(
            ops.group_points(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(centers),
                knn_idx, radius=0.5,
            )
        )
        assert got.shape == (B * M, G, K, 4)
        ki = np.asarray(knn_idx)
        # Row m of B*M uses cloud 0's geometry and feature set m.
        for m in range(M):
            np.testing.assert_allclose(
                got[m, 0, :, :3], (xyz[0][ki[0, 0]] - centers[0, 0]) / 0.5, atol=1e-6
            )
            np.testing.assert_array_equal(got[m, 0, :, 3:], feats[m][ki[0, 0]])

    def test_repeat_interleave(self, rng):
        x = rng.standard_normal((2, 3), dtype=np.float32)
        got = np.asarray(ops.repeat_interleave(jnp.asarray(x), 3, axis=0))
        want = np.repeat(x, 3, axis=0)
        np.testing.assert_array_equal(got, want)

    def test_group_voronoi(self, rng):
        B, N, L, C = 2, 20, 4, 2
        xyz = rng.standard_normal((B, N, 3), dtype=np.float32)
        feats = rng.standard_normal((B, N, C), dtype=np.float32)
        centers = xyz[:, :L]
        _, nn_idx = ops.nn1(jnp.asarray(xyz), jnp.asarray(centers))
        got = np.asarray(
            ops.group_voronoi(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(centers), nn_idx
            )
        )
        assert got.shape == (B, N, 3 + 1 + C)
        norms = np.linalg.norm(got[..., :3], axis=-1)
        dists = got[..., 3]
        # Unit directions, except points coinciding with their center
        # (zero vector, matching the reference's clamp semantics).
        np.testing.assert_allclose(norms[dists > 1e-6], 1.0, atol=1e-4)
        np.testing.assert_allclose(norms[dists <= 1e-6], 0.0, atol=1e-4)


class TestInterp:
    def test_weights_sum_to_one(self, rng):
        q = rng.standard_normal((2, 40, 3), dtype=np.float32)
        k = rng.standard_normal((2, 10, 3), dtype=np.float32)
        _, w = ops.compute_interp_weights(jnp.asarray(q), jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)

    def test_exact_at_key_location(self, rng):
        k = rng.standard_normal((1, 10, 3), dtype=np.float32)
        feats = rng.standard_normal((1, 10, 4), dtype=np.float32)
        q = k[:, :5]  # queries exactly on keys
        idx, w = ops.compute_interp_weights(jnp.asarray(q), jnp.asarray(k))
        out = np.asarray(ops.interpolate_features(jnp.asarray(feats), idx, w))
        np.testing.assert_allclose(out, feats[:, :5], atol=1e-4)

    def test_interpolate_matches_manual(self, rng):
        B, L, N, K, C = 2, 6, 15, 3, 4
        x = rng.standard_normal((B, L, C), dtype=np.float32)
        idx = rng.integers(0, L, (B, N, K))
        w = rng.random((B, N, K), dtype=np.float32)
        got = np.asarray(
            ops.interpolate_features(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w))
        )
        want = np.einsum("bnkc,bnk->bnc", np.stack([x[b][idx[b]] for b in range(B)]), w)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_repeated_variant(self, rng):
        B, M, L, N, C = 1, 2, 6, 10, 3
        x = rng.standard_normal((B * M, L, C), dtype=np.float32)
        idx = rng.integers(0, L, (B, N, 3))
        w = rng.random((B, N, 3), dtype=np.float32)
        got = np.asarray(
            ops.interpolate_features_repeated(
                jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w)
            )
        )
        assert got.shape == (B * M, N, C)
        for m in range(M):
            want = np.einsum("nkc,nk->nc", x[m][idx[0]], w[0])
            np.testing.assert_allclose(got[m], want, atol=1e-5)


class TestInterpPallas:
    def test_matches_xla(self, rng):
        from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

        q = jnp.asarray(rng.standard_normal((2, 300, 3), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((2, 32, 3), dtype=np.float32))
        i1, w1 = interp_weights_pallas(q, k, tile_q=128, interpret=True)
        d2, i2 = ops.knn(q, k, 3, method="exact")
        inv = 1.0 / np.maximum(np.asarray(d2), 1e-8)
        w2 = inv / inv.sum(-1, keepdims=True)
        assert (np.sort(np.asarray(i1), -1) == np.sort(np.asarray(i2), -1)).all()
        np.testing.assert_allclose(
            np.sort(np.asarray(w1), -1), np.sort(w2, -1), atol=1e-5
        )

    def test_padding_tail(self, rng):
        from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

        # N not a multiple of tile_q exercises the pad/crop path.
        q = jnp.asarray(rng.standard_normal((1, 77, 3), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((1, 16, 3), dtype=np.float32))
        i1, w1 = interp_weights_pallas(q, k, tile_q=64, interpret=True)
        assert i1.shape == (1, 77, 3)
        np.testing.assert_allclose(np.asarray(w1).sum(-1), 1.0, atol=1e-5)


class TestScatter:
    def test_scatter_max_matches_numpy(self, rng):
        B, N, L, C = 2, 30, 5, 4
        x = rng.standard_normal((B, N, C), dtype=np.float32)
        idx = rng.integers(0, L, (B, N))
        got = np.asarray(ops.scatter_max(jnp.asarray(x), jnp.asarray(idx), L))
        want = np.zeros((B, L, C), np.float32)
        for b in range(B):
            for l_ in range(L):
                sel = x[b][idx[b] == l_]
                if len(sel):
                    want[b, l_] = sel.max(0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_empty_segment_fill(self, rng):
        x = rng.standard_normal((1, 4, 2), dtype=np.float32)
        idx = np.zeros((1, 4), np.int32)  # everything in segment 0
        got = np.asarray(ops.scatter_max(jnp.asarray(x), jnp.asarray(idx), 3))
        np.testing.assert_allclose(got[0, 1:], 0.0)
