"""Multi-device sharded geometry vs single-device results (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from point_sam_tpu import ops
from point_sam_tpu.parallel import make_mesh
from point_sam_tpu.parallel.sharded_geometry import (
    sharded_knn,
    sharded_min_sq_dist_to_complement,
)


class TestShardedKNN:
    def test_matches_single_device(self, rng):
        mesh = make_mesh()
        B, Nq, Nk, k = 2, 64, 1024, 8
        q = jnp.asarray(rng.standard_normal((B, Nq, 3)).astype(np.float32))
        keys = jnp.asarray(rng.standard_normal((B, Nk, 3)).astype(np.float32))
        keys_sh = jax.device_put(keys, NamedSharding(mesh, P(None, "data")))

        d_sh, i_sh = sharded_knn(q, keys_sh, k, mesh, method="exact")
        d_ref, i_ref = ops.knn(q, keys, k, method="exact")
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                                   atol=1e-5)
        # Indices agree where distances are tie-free.
        agree = (np.asarray(i_sh) == np.asarray(i_ref)).mean()
        assert agree > 0.99


class TestShardedBorderDistance:
    def test_matches_single_device(self, rng):
        mesh = make_mesh()
        B, R, N = 1, 2, 512
        coords = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        regions = jnp.asarray(rng.random((B, R, N)) < 0.4)

        ref = ops.min_sq_dist_to_complement(coords, regions, key_tile=128)

        c_sh = jax.device_put(coords, NamedSharding(mesh, P(None, "data")))
        r_sh = jax.device_put(regions, NamedSharding(mesh, P(None, None, "data")))
        got = sharded_min_sq_dist_to_complement(
            c_sh, r_sh, coords, regions, mesh
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestShardedKNNValid:
    def test_key_valid_excludes_padding(self, rng):
        mesh = make_mesh()
        B, Nq, Nk, k = 1, 32, 1024, 4
        q = jnp.asarray(rng.standard_normal((B, Nq, 3)).astype(np.float32))
        keys = np.zeros((B, Nk, 3), np.float32)  # padding at the origin...
        keys[:, :512] = rng.standard_normal((B, 512, 3))
        valid = np.zeros((B, Nk), bool)
        valid[:, :512] = True
        d_sh, i_sh = sharded_knn(
            jnp.asarray(q), jnp.asarray(keys), k, mesh, method="exact",
            key_valid=jnp.asarray(valid),
        )
        assert (np.asarray(i_sh) < 512).all(), "padded key selected"
        d_ref, i_ref = ops.knn(q, jnp.asarray(keys), k, method="exact",
                               key_valid=jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                                   atol=1e-5)


class TestShardedEvaluator:
    def test_big_bucket_uses_sharded_geometry_and_matches(self, rng):
        """The evaluator's top bucket runs point-axis-sharded kNN; IoUs
        must match the single-device evaluator (exact kNN both sides)."""
        from point_sam_tpu.datasets.synthetic import generate_scene
        from point_sam_tpu.evalsuite.eval_interactive import (
            InteractiveEvaluator, normalize_scene)
        from point_sam_tpu.models import (PointCloudSAM, PointSAMConfig,
                                          TokenizerConfig, init_variables)

        cfg = PointSAMConfig(
            vit="tiny", tokenizer=TokenizerConfig(num_patches=32, patch_size=8),
            prompt_iters=2)
        model = PointCloudSAM(cfg)
        variables = init_variables(model, jax.random.PRNGKey(0))
        ex = generate_scene(5, num_points=1500)
        xyz, rgb = normalize_scene(ex["coords"], ex["features"])
        gt = ex["gt_masks"][:2]

        mesh = make_mesh()
        kw = dict(num_clicks=2, point_buckets=(2048,), masks_per_batch=2,
                  knn_method="exact")
        ev_sh = InteractiveEvaluator(model, variables, mesh=mesh, **kw)
        ev_1d = InteractiveEvaluator(model, variables, **kw)
        assert ev_sh._use_sharded(2048, ev_sh._tokenizer_for(len(xyz)))
        ious_sh = ev_sh.evaluate_scene(xyz, rgb, gt)
        ious_1d = ev_1d.evaluate_scene(xyz, rgb, gt)
        np.testing.assert_allclose(ious_sh, ious_1d, atol=2e-2)


class TestShardedDecode:
    def test_point_sharded_decode_matches_single_device(self, rng):
        """for_sharded_eval: the decoder's point-axis GSPMD constraints
        (interp -> upscale MLP -> hypernet dot) must not change numerics
        vs the unsharded layout (VERDICT r2 next #9)."""
        from point_sam_tpu.models import (
            PointCloudSAM, PointSAMConfig, TokenizerConfig,
            for_sharded_eval, init_variables,
        )

        mesh = make_mesh()
        cfg = PointSAMConfig(vit="tiny",
                             tokenizer=TokenizerConfig(16, 8),
                             prompt_iters=1)
        model = PointCloudSAM(cfg)
        v = init_variables(model, jax.random.PRNGKey(0))
        N = 1024  # divisible by the 8-device mesh
        coords = jnp.asarray(
            rng.standard_normal((1, N, 3)).astype(np.float32) / 3)
        feats = jnp.asarray(rng.random((1, N, 3)).astype(np.float32))
        geom = jax.jit(model.make_geometry)(coords)
        emb, pe = model.apply(v, coords, feats, geom, method=model.encode)
        pc = coords[:, :1]
        pl = jnp.ones((1, 1), bool)

        masks_ref, iou_ref = jax.jit(
            lambda v_, e, p: model.apply(v_, e, p, coords, geom, pc, pl,
                                         None, method=model.decode)
        )(v, emb, pe)

        smodel = for_sharded_eval(model, mesh)
        assert smodel.cfg.decode_point_mesh is mesh
        masks_sh, iou_sh = jax.jit(
            lambda v_, e, p: smodel.apply(v_, e, p, coords, geom, pc, pl,
                                          None, method=smodel.decode)
        )(v, emb, pe)
        np.testing.assert_allclose(np.asarray(masks_sh),
                                   np.asarray(masks_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(iou_sh), np.asarray(iou_ref),
                                   atol=2e-5)

    def test_point_sharded_FUSED_decode_matches_single_device(self, rng):
        """The shard_map-wrapped interp-fused Pallas kernel (VERDICT r4 #5:
        giant-scene eval used to fall back to the XLA gather+tail chain)
        must match the unsharded decode. Forced on CPU by monkeypatching
        the dispatch gate + interpret-mode kernel."""
        import functools

        import point_sam_tpu.ops.upscale_pallas as up
        from point_sam_tpu.models import (
            PointCloudSAM, PointSAMConfig, TokenizerConfig,
            for_sharded_eval, init_variables,
        )

        mesh = make_mesh()
        cfg = PointSAMConfig(vit="tiny",
                             tokenizer=TokenizerConfig(16, 8),
                             prompt_iters=1)
        model = PointCloudSAM(cfg)
        v = init_variables(model, jax.random.PRNGKey(0))
        N = 1024
        coords = jnp.asarray(
            rng.standard_normal((1, N, 3)).astype(np.float32) / 3)
        feats = jnp.asarray(rng.random((1, N, 3)).astype(np.float32))
        geom = jax.jit(model.make_geometry)(coords)
        emb, pe = model.apply(v, coords, feats, geom, method=model.encode)
        pc = coords[:, :1]
        pl = jnp.ones((1, 1), bool)

        masks_ref, iou_ref = jax.jit(
            lambda v_, e, p: model.apply(v_, e, p, coords, geom, pc, pl,
                                         None, method=model.decode)
        )(v, emb, pe)

        smodel = for_sharded_eval(model, mesh)
        orig_gate = up.interp_upscale_dispatch_ok
        orig_fused = up.interp_upscale_hyper_fused
        try:
            up.interp_upscale_dispatch_ok = (
                lambda *a, **k: True)
            up.interp_upscale_hyper_fused = functools.partial(
                orig_fused, interpret=True)
            masks_sh, iou_sh = jax.jit(
                lambda v_, e, p: smodel.apply(v_, e, p, coords, geom, pc,
                                              pl, None,
                                              method=smodel.decode)
            )(v, emb, pe)
        finally:
            up.interp_upscale_dispatch_ok = orig_gate
            up.interp_upscale_hyper_fused = orig_fused
        np.testing.assert_allclose(np.asarray(masks_sh),
                                   np.asarray(masks_ref),
                                   atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(iou_sh), np.asarray(iou_ref),
                                   atol=2e-5)
