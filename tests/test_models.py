"""Model-stack tests: shapes, masking invariants, loss semantics, and a tiny
end-to-end training forward + gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_sam_tpu import models
from point_sam_tpu.models import (
    PointCloudSAM,
    PointSAMConfig,
    TokenizerConfig,
    compute_geometry,
)


def tiny_cfg(prompt_iters=3):
    return PointSAMConfig(
        vit="tiny",
        tokenizer=TokenizerConfig(num_patches=16, patch_size=8),
        prompt_iters=prompt_iters,
    )


def make_inputs(rng, B=2, N=256, M=2):
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    coords /= np.abs(coords).max() + 1e-3  # keep in [-1, 1] for the PE
    feats = rng.random((B, N, 3)).astype(np.float32)
    gt = np.zeros((B, M, N), bool)
    for b in range(B):
        for m in range(M):
            anchor = coords[b, rng.integers(N)]
            d = ((coords[b] - anchor) ** 2).sum(-1)
            gt[b, m] = d < np.quantile(d, 0.3)
    return jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(gt)


@pytest.fixture(scope="module")
def model_and_vars():
    rngs = np.random.default_rng(0)
    coords, feats, gt = make_inputs(rngs)
    model = PointCloudSAM(tiny_cfg())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        coords, feats, gt,
    )
    return model, variables, (coords, feats, gt)


class TestViT:
    def test_shapes_and_dtype(self):
        cfg = models.get_vit_config("tiny")
        vit = models.ViT(cfg, dtype=jnp.bfloat16)
        x = jnp.ones((2, 10, cfg.embed_dim))
        vars_ = vit.init(jax.random.PRNGKey(0), x)
        y = vit.apply(vars_, x)
        assert y.shape == x.shape
        assert y.dtype == jnp.bfloat16

    def test_presets_match_reference_backbones(self):
        # Reference configs name eva02_base/eva02_large/eva_giant
        # (configs/model/*.yaml:12).
        b = models.get_vit_config("eva02_base")
        assert (b.embed_dim, b.depth, b.num_heads) == (768, 12, 12)
        l = models.get_vit_config("eva02_large")
        assert (l.embed_dim, l.depth, l.num_heads) == (1024, 24, 16)
        g = models.get_vit_config("eva_giant")
        assert (g.embed_dim, g.depth, g.num_heads) == (1408, 40, 16)
        assert g.qkv_fused and not g.swiglu


class TestTwoWayTransformer:
    def test_padding_invariance(self, rng):
        """Adding invalid token slots must not change valid tokens' outputs
        nor the pc embeddings — the fixed-shape buffer's core invariant."""
        D = 32
        twt = models.TwoWayTransformer(depth=2, embed_dim=D, num_heads=4,
                                       mlp_dim=64)
        pc = jnp.asarray(rng.standard_normal((1, 10, D)), jnp.float32)
        pe = jnp.asarray(rng.standard_normal((1, 10, D)), jnp.float32)
        tok = jnp.asarray(rng.standard_normal((1, 3, D)), jnp.float32)
        vars_ = twt.init(jax.random.PRNGKey(0), pc, pe, tok)

        q1, k1 = twt.apply(vars_, pc, pe, tok,
                           token_valid=jnp.ones((1, 3), bool))
        tok_pad = jnp.concatenate(
            [tok, jnp.asarray(rng.standard_normal((1, 2, D)), jnp.float32)],
            axis=1,
        )
        valid = jnp.asarray([[True, True, True, False, False]])
        q2, k2 = twt.apply(vars_, pc, pe, tok_pad, token_valid=valid)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2[:, :3]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-5)


class TestPromptEncoder:
    def test_point_encoder_labels(self, rng):
        pe = models.PointEncoder(embed_dim=32)
        pts = jnp.zeros((2, 4, 3))
        labels = jnp.asarray([[1, 0, 1, 0], [0, 0, 1, 1]], bool)
        vars_ = pe.init(jax.random.PRNGKey(0), pts, labels)
        out = pe.apply(vars_, pts, labels)
        assert out.shape == (2, 4, 32)
        # Same coords, different labels -> different embeddings.
        assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))
        # Same coords + same label -> identical embeddings.
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(out[0, 2]),
                                   atol=1e-6)
        # The gaussian matrix must live in the buffers collection, not params.
        assert "buffers" in vars_
        flat = jax.tree_util.tree_leaves_with_path(vars_["params"])
        assert not any("gaussian" in jax.tree_util.keystr(p) for p, _ in flat)

    def test_mask_encoder_cached_rel_xyz_bit_equal(self, rng):
        """The cached click-invariant grouping path (mask_group_rel_xyz +
        logit-only gather) must be bit-identical to the full group_points
        path the reference uses every iteration (prompt_encoder.py:114-121)."""
        from point_sam_tpu.models.prompt_encoder import (
            MaskEncoder,
            mask_group_rel_xyz,
        )

        B, M, N, L, K, D = 2, 3, 64, 8, 16, 32
        coords = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        centers = coords[:, :L]
        knn_idx = jnp.asarray(rng.integers(0, N, (B, L, K)))
        masks = jnp.asarray(rng.standard_normal((B * M, N)), jnp.float32)
        enc = MaskEncoder(embed_dim=D)
        vars_ = enc.init(jax.random.PRNGKey(0), masks, coords, centers,
                         knn_idx)
        ref = enc.apply(vars_, masks, coords, centers, knn_idx)
        cached = enc.apply(
            vars_, masks, coords, centers, knn_idx,
            rel_xyz=mask_group_rel_xyz(coords, centers, knn_idx),
        )
        assert ref.shape == (B * M, L, D)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(cached))

    def test_mask_encoder_hier_cached_rel_xyz_bit_equal(self, rng):
        """Two-level cached grouping path vs the reference full-regroup
        (prompt_encoder.py:158-176) — must be bit-identical."""
        from point_sam_tpu.models.prompt_encoder import (
            MaskEncoderHier,
            mask_group_rel_xyz,
        )

        B, M, N, G1, K1, G2, K2 = 2, 2, 64, 16, 8, 4, 4
        r = (0.2, 0.6)
        coords = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        c1 = coords[:, :G1]
        c2 = coords[:, :G2]
        idx1 = jnp.asarray(rng.integers(0, N, (B, G1, K1)))
        idx2 = jnp.asarray(rng.integers(0, G1, (B, G2, K2)))
        masks = jnp.asarray(rng.standard_normal((B * M, N)), jnp.float32)
        enc = MaskEncoderHier(embed_dim=32, radius=r)
        vars_ = enc.init(jax.random.PRNGKey(0), masks, coords, c1, idx1,
                         c2, idx2)
        ref1, ref2 = enc.apply(vars_, masks, coords, c1, idx1, c2, idx2)
        got1, got2 = enc.apply(
            vars_, masks, coords, c1, idx1, c2, idx2,
            rel_xyz1=mask_group_rel_xyz(coords, c1, idx1, radius=r[0]),
            rel_xyz2=mask_group_rel_xyz(c1, c2, idx2, radius=r[1]),
        )
        np.testing.assert_array_equal(np.asarray(ref1), np.asarray(got1))
        np.testing.assert_array_equal(np.asarray(ref2), np.asarray(got2))

    def test_mask_encoder_nn_cached_nbr_dist_bit_equal(self, rng):
        """Voronoi cached per-point offsets vs the inline recompute
        (reference prompt_encoder.py:264-270) — must be bit-identical."""
        from point_sam_tpu.models.prompt_encoder import (
            MaskEncoderNN,
            mask_nbr_dist,
        )

        B, M, N, L = 2, 2, 64, 8
        coords = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        centers = coords[:, :L]
        nn_idx = jnp.asarray(rng.integers(0, L, (B, N)))
        masks = jnp.asarray(rng.standard_normal((B * M, N)), jnp.float32)
        valid = jnp.asarray(rng.random((B, N)) < 0.9)
        enc = MaskEncoderNN(embed_dim=32, num_patches=L, hidden_dim=64)
        vars_ = enc.init(jax.random.PRNGKey(0), masks, coords, centers,
                         nn_idx, valid)
        ref = enc.apply(vars_, masks, coords, centers, nn_idx, valid)
        got = enc.apply(vars_, masks, coords, centers, nn_idx, valid,
                        nbr_dist=mask_nbr_dist(coords, centers, nn_idx))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_pe_in_range(self, rng):
        layer = models.PositionEmbeddingRandom(num_pos_feats=16)
        coords = jnp.asarray(rng.uniform(-1, 1, (5, 3)), jnp.float32)
        vars_ = layer.init(jax.random.PRNGKey(0), coords)
        out = layer.apply(vars_, coords)
        assert out.shape == (5, 32)
        assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6  # sin/cos bounded


class TestLoss:
    def test_dice_perfect_prediction(self):
        probs = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        targets = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        loss = models.dice_loss(probs, targets)
        assert float(loss[0]) < 1e-3

    def test_focal_matches_bce_at_gamma0(self, rng):
        logits = jnp.asarray(rng.standard_normal((4, 7)), jnp.float32)
        targets = jnp.asarray(rng.integers(0, 2, (4, 7)), jnp.float32)
        focal = models.sigmoid_focal_loss(logits, targets, gamma=0.0)
        bce = models.loss.optax_sigmoid_ce(logits, targets)
        np.testing.assert_allclose(np.asarray(focal), np.asarray(bce), atol=1e-6)

    def test_compute_iou(self):
        logits = jnp.asarray([[10.0, 10.0, -10.0, -10.0]])
        targets = jnp.asarray([[True, False, False, False]])
        iou = models.compute_iou(logits, targets)
        np.testing.assert_allclose(np.asarray(iou), [0.5])

    def test_criterion_min_loss_selection(self, rng):
        BM, C, N = 3, 3, 32
        gt = jnp.asarray(rng.integers(0, 2, (BM, N)).astype(bool))
        # channel 1 predicts gt perfectly; others are noise.
        noise = rng.standard_normal((BM, C, N)).astype(np.float32)
        noise[:, 1] = np.where(np.asarray(gt), 20.0, -20.0)
        masks = jnp.asarray(noise)
        iou_preds = jnp.ones((BM, C)) * 0.5
        outputs = [dict(masks=masks, iou_preds=iou_preds)]
        loss, aux = models.criterion(outputs, gt)
        np.testing.assert_allclose(
            np.asarray(aux[0]["best_masks"]), noise[:, 1], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(aux[0]["iou"]), 1.0)


class TestPointCloudSAM:
    def test_train_forward_shapes(self, model_and_vars):
        model, variables, (coords, feats, gt) = model_and_vars
        B, M, N = gt.shape
        outputs = model.apply(
            variables, coords, feats, gt,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        assert len(outputs) == model.cfg.prompt_iters
        assert outputs[0]["masks"].shape == (B * M, 3, N)
        assert outputs[0]["iou_preds"].shape == (B * M, 3)
        for out in outputs[1:]:
            assert out["masks"].shape == (B * M, 1, N)
        # Click accumulation: iteration i has i+1 prompt slots.
        for i, out in enumerate(outputs):
            assert out["prompt_coords"].shape == (B * M, i + 1, 3)

    def test_eval_forward_all_clicks_valid(self, model_and_vars):
        model, variables, (coords, feats, gt) = model_and_vars
        outputs = model.apply(variables, coords, feats, gt, is_eval=True)
        assert bool(jnp.all(outputs[-1]["prompt_valid"]))

    def test_train_forward_has_refinement_iter(self, model_and_vars):
        model, variables, (coords, feats, gt) = model_and_vars
        outputs = model.apply(
            variables, coords, feats, gt,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        valid = np.asarray(outputs[-1]["prompt_valid"])
        # Last iteration is statically click-free; one more random
        # refinement iteration in [1, iters) may or may not coincide with it
        # (reference :129-132) -> iters-2 or iters-1 clicks, same for all rows.
        assert valid[:, 0].all()
        assert not valid[:, -1].any()
        counts = valid.sum(1)
        assert (counts == counts[0]).all()
        iters = model.cfg.prompt_iters
        assert counts[0] in (iters - 2, iters - 1)

    def test_single_iteration_still_clicks(self, rng):
        """prompt_iters=1: the lone iteration is both first and last; the
        reference's `i == 0 or ...` short-circuit means it must click."""
        coords, feats, gt = make_inputs(rng, B=1, N=128, M=1)
        model = PointCloudSAM(PointSAMConfig(
            vit="tiny", tokenizer=TokenizerConfig(16, 8), prompt_iters=1))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            coords, feats, gt,
        )
        outputs = model.apply(variables, coords, feats, gt,
                              rngs={"sampler": jax.random.PRNGKey(2)})
        assert bool(outputs[0]["prompt_valid"].all())

    def test_predict_masks_api(self, model_and_vars):
        model, variables, (coords, feats, gt) = model_and_vars
        B, M, N = gt.shape
        pc = jnp.zeros((B, 1, 3))
        pl = jnp.ones((B, 1), bool)
        masks, ious = model.apply(
            variables, coords, feats, pc, pl, method=model.predict_masks
        )
        assert masks.shape == (B, 3, N)
        assert ious.shape == (B, 3)

    def test_cast_params_for_inference_bit_identical(self, rng):
        """Pre-casting kernels to bf16 must be BIT-identical on a bf16
        model (flax promotes them to bf16 inside every Dense anyway) and
        must leave LayerNorm scale/bias fp32 (consumed in fp32 stats)."""
        import flax

        coords, feats, gt = make_inputs(rng, B=1, N=128, M=1)
        model = PointCloudSAM(
            PointSAMConfig(vit="tiny", tokenizer=TokenizerConfig(16, 8),
                           prompt_iters=2),
            dtype=jnp.bfloat16,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "sampler": jax.random.PRNGKey(1)},
            coords, feats, gt,
        )
        cast = models.cast_params_for_inference(variables)
        flat = flax.traverse_util.flatten_dict(cast)
        assert any(v.dtype == jnp.bfloat16 for k, v in flat.items()
                   if k[-1] == "kernel")
        assert all(v.dtype == jnp.float32 for k, v in flat.items()
                   if k[-1] in ("scale", "bias"))
        pc = jnp.zeros((1, 1, 3))
        pl = jnp.ones((1, 1), bool)
        m0, i0 = model.apply(variables, coords, feats, pc, pl,
                             method=model.predict_masks)
        m1, i1 = model.apply(cast, coords, feats, pc, pl,
                             method=model.predict_masks)
        np.testing.assert_array_equal(np.asarray(m0, np.float32),
                                      np.asarray(m1, np.float32))
        np.testing.assert_array_equal(np.asarray(i0, np.float32),
                                      np.asarray(i1, np.float32))

    def test_loss_and_grad_finite(self, model_and_vars):
        model, variables, (coords, feats, gt) = model_and_vars
        B, M, N = gt.shape
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            outputs = model.apply(
                {"params": p, **rest}, coords, feats, gt,
                rngs={"sampler": jax.random.PRNGKey(3)},
            )
            loss, _ = models.criterion(outputs, gt.reshape(B * M, N))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # Encoder must receive gradient through the click loop.
        gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
        assert gnorm > 0
