"""Tensor-parallel ViT sharding (parallel/tensor_parallel.py).

8-virtual-device CPU mesh (conftest): a (data=2, model=4) mesh with the
tiny model (heads=4, mlp hidden 256 — both divisible by 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from point_sam_tpu.models import (
    PointCloudSAM,
    PointSAMConfig,
    TokenizerConfig,
    compute_geometry,
    init_variables,
)
from point_sam_tpu.parallel import (
    MODEL_AXIS,
    TrainState,
    make_mesh_2d,
    make_optimizer,
    make_train_step,
    tp_place,
    tp_spec_tree,
)
from point_sam_tpu.train.schedule import warmup_multistep


@pytest.fixture(scope="module")
def setup():
    tok = TokenizerConfig(num_patches=32, patch_size=16)
    cfg = PointSAMConfig(vit="tiny", tokenizer=tok, prompt_iters=1)
    model = PointCloudSAM(cfg)
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
    feats = jnp.asarray(rng.random((2, 512, 3)).astype(np.float32))
    return model, variables, coords, feats


class TestSpecTree:
    def test_vit_matrices_sharded(self, setup):
        model, variables, *_ = setup
        specs = tp_spec_tree(variables["params"], 4)
        blk = specs["pc_encoder"]["transformer"]["blocks"]["block"]
        # scan layout: kernels [depth, in, out]
        assert blk["attn"]["q_proj"]["kernel"] == P(None, None, MODEL_AXIS)
        assert blk["attn"]["proj"]["kernel"] == P(None, MODEL_AXIS, None)
        assert blk["mlp"]["fc1_g"]["kernel"] == P(None, None, MODEL_AXIS)
        assert blk["mlp"]["fc2"]["kernel"] == P(None, MODEL_AXIS, None)
        assert blk["mlp"]["fc1_g"]["bias"] == P(None, MODEL_AXIS)
        # LN over the (replicated) embed axis stays replicated
        assert blk["norm1"]["LayerNorm_0"]["scale"] == P()
        # non-ViT modules replicated
        flat = jax.tree_util.tree_flatten_with_path(specs["mask_decoder"])[0]
        assert all(spec == P() for _, spec in flat)

    def test_indivisible_falls_back(self, setup):
        model, variables, *_ = setup
        # tiny mlp hidden = 256; 7 does not divide it -> replicated
        specs = tp_spec_tree(variables["params"], 7)
        blk = specs["pc_encoder"]["transformer"]["blocks"]["block"]
        assert blk["mlp"]["fc1_g"]["kernel"] == P()


class TestTPNumericsAndPlacement:
    def test_encode_matches_replicated(self, setup):
        model, variables, coords, feats = setup
        geom = compute_geometry(coords, model.cfg.tokenizer)

        def encode(v, c, f, g):
            return model.apply(v, c, f, g, method=model.encode)

        want_emb, want_pe = jax.jit(encode)(variables, coords, feats, geom)

        mesh = make_mesh_2d(2, 4)
        v_tp = tp_place(variables, mesh)
        # placement check: column-parallel kernel is actually split
        k = v_tp["params"]["pc_encoder"]["transformer"]["blocks"]["block"][
            "mlp"]["fc1_g"]["kernel"]
        shard = k.addressable_shards[0].data
        assert shard.shape[-1] == k.shape[-1] // 4

        got_emb, got_pe = jax.jit(encode)(v_tp, coords, feats, geom)
        np.testing.assert_allclose(
            np.asarray(got_emb), np.asarray(want_emb), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_pe), np.asarray(want_pe), rtol=2e-5, atol=2e-5
        )

    def test_tp_train_step(self, setup):
        model, variables, coords, feats = setup
        mesh = make_mesh_2d(2, 4)
        tx = make_optimizer(warmup_multistep(1e-3, [100], warmup_iters=1))
        params = variables["params"]
        buffers = {k: v for k, v in variables.items() if k != "params"}
        state = TrainState.create(params, buffers, tx)
        from point_sam_tpu.parallel import tp_sharding_tree

        state = jax.tree_util.tree_map(
            jax.device_put, state, tp_sharding_tree(state, mesh)
        )
        step_fn = make_train_step(
            model, tx, mesh, donate=False, param_sharding="tp",
            state_example=state,
        )
        rng = np.random.default_rng(1)
        batch = {
            "coords": coords,
            "features": feats,
            "gt_masks": jnp.asarray(rng.random((2, 2, 512)) < 0.3),
        }
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # updated params keep their TP sharding
        k = new_state.params["pc_encoder"]["transformer"]["blocks"]["block"][
            "mlp"]["fc1_g"]["kernel"]
        assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 4
