"""Tests for the device-side click simulator vs a NumPy transcription of the
reference's sampling rule (pc_sam/model/common.py:368-474)."""

import numpy as np
import jax
import jax.numpy as jnp

from point_sam_tpu import ops


def ref_border_dist(coords, region):
    """NumPy transcription of sample_furthest_points_from_border."""
    fg = np.nonzero(region)[0]
    bg = np.nonzero(~region)[0]
    if len(fg) == 0 or len(bg) == 0:
        return None, -np.inf
    d = ((coords[fg][:, None] - coords[bg][None]) ** 2).sum(-1).min(-1)
    return fg[np.argmax(d)], d.max()


def ref_sample(coords, gt_masks, pred_logits):
    """NumPy transcription of sample_fixed_points (threshold=None)."""
    B, M, N = gt_masks.shape
    out_idx = []
    if pred_logits is None:
        for b in range(B):
            for m in range(M):
                i, _ = ref_border_dist(coords[b], gt_masks[b, m])
                out_idx.append((b, i))
    else:
        pred = pred_logits.reshape(B, M, N) > 0
        fn = gt_masks & ~pred
        fp = ~gt_masks & pred
        for b in range(B):
            for m in range(M):
                pi, pd = ref_border_dist(coords[b], fn[b, m])
                ni, nd = ref_border_dist(coords[b], fp[b, m])
                if pd > nd:
                    out_idx.append((b, pi))
                elif nd == -np.inf:
                    gi, _ = ref_border_dist(coords[b], gt_masks[b, m])
                    out_idx.append((b, gi))
                else:
                    out_idx.append((b, ni))
    return out_idx


def make_case(rng, B=2, M=2, N=300):
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    gt = np.zeros((B, M, N), bool)
    for b in range(B):
        for m in range(M):
            # A spatially coherent mask: points near a random anchor.
            anchor = coords[b, rng.integers(N)]
            d = ((coords[b] - anchor) ** 2).sum(-1)
            gt[b, m] = d < np.quantile(d, 0.3)
    return coords, gt


class TestMinDistToComplement:
    def test_matches_numpy(self, rng):
        coords, gt = make_case(rng, B=1, M=2, N=128)
        got = np.asarray(
            ops.min_sq_dist_to_complement(
                jnp.asarray(coords), jnp.asarray(gt), key_tile=50
            )
        )
        for m in range(2):
            bg = ~gt[0, m]
            want = ((coords[0][:, None] - coords[0][bg][None]) ** 2).sum(-1).min(-1)
            np.testing.assert_allclose(got[0, m], want, atol=1e-4)

    def test_empty_complement_is_inf(self, rng):
        coords = rng.standard_normal((1, 16, 3)).astype(np.float32)
        region = np.ones((1, 1, 16), bool)
        got = np.asarray(
            ops.min_sq_dist_to_complement(jnp.asarray(coords), jnp.asarray(region))
        )
        assert np.isinf(got).all()


class TestSamplePrompts:
    def test_first_click_matches_reference_rule(self, rng):
        coords, gt = make_case(rng)
        pc, pl = ops.sample_prompts(jnp.asarray(coords), jnp.asarray(gt), key_tile=64)
        want = ref_sample(coords, gt, None)
        got_pc = np.asarray(pc)
        for row, (b, i) in enumerate(want):
            np.testing.assert_allclose(got_pc[row, 0], coords[b, i], atol=1e-5)
        assert np.asarray(pl).all()  # first click is always positive

    def test_later_click_matches_reference_rule(self, rng):
        coords, gt = make_case(rng)
        B, M, N = gt.shape
        logits = rng.standard_normal((B * M, N)).astype(np.float32)
        pc, pl = ops.sample_prompts(
            jnp.asarray(coords), jnp.asarray(gt), jnp.asarray(logits), key_tile=64
        )
        want = ref_sample(coords, gt, logits)
        got_pc, got_pl = np.asarray(pc), np.asarray(pl)
        gt_flat = gt.reshape(B * M, N)
        for row, (b, i) in enumerate(want):
            np.testing.assert_allclose(got_pc[row, 0], coords[b, i], atol=1e-5)
            assert got_pl[row, 0] == gt_flat[row, i]

    def test_perfect_prediction_falls_back_to_gt(self, rng):
        coords, gt = make_case(rng, B=1, M=1)
        logits = np.where(gt.reshape(1, -1), 10.0, -10.0).astype(np.float32)
        pc, pl = ops.sample_prompts(
            jnp.asarray(coords), jnp.asarray(gt), jnp.asarray(logits), key_tile=64
        )
        # fn and fp empty -> gt fallback, positive label.
        want = ref_sample(coords, gt, logits)
        np.testing.assert_allclose(
            np.asarray(pc)[0, 0], coords[0, want[0][1]], atol=1e-5
        )
        assert np.asarray(pl)[0, 0]

    def test_point_valid_excludes_padding(self, rng):
        coords, gt = make_case(rng, B=1, M=1, N=200)
        # Padding points placed far away; if counted as complement they'd
        # distort border distances, if counted as region they'd win argmax.
        coords[0, 150:] = 50.0
        gt[0, :, 150:] = False
        valid = np.arange(200) < 150
        pc, _ = ops.sample_prompts(
            jnp.asarray(coords),
            jnp.asarray(gt),
            point_valid=jnp.asarray(valid[None]),
            key_tile=64,
        )
        want = ref_sample(coords[:, :150], gt[:, :, :150], None)
        np.testing.assert_allclose(
            np.asarray(pc)[0, 0], coords[0, want[0][1]], atol=1e-5
        )

    def test_random_sampler_in_error_region(self, rng):
        coords, gt = make_case(rng, B=1, M=2)
        key = jax.random.PRNGKey(0)
        pc, pl = ops.sample_prompts_random(key, jnp.asarray(coords), jnp.asarray(gt))
        got_pc, got_pl = np.asarray(pc), np.asarray(pl)
        # Sampled point must be a gt-mask point, label positive.
        for m in range(2):
            hits = (np.abs(coords[0][gt[0, m]] - got_pc[m, 0]).max(-1) < 1e-6).any()
            assert hits
        assert got_pl.all()
