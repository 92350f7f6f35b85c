"""Trainer-layer tests: LR schedule semantics, mesh-sharded train step,
gradient accumulation equivalence, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from point_sam_tpu.models import (
    PointCloudSAM,
    PointSAMConfig,
    TokenizerConfig,
)
from point_sam_tpu.parallel import (
    TrainState,
    make_mesh,
    make_optimizer,
    make_train_step,
    replicate,
    shard_batch,
)
from point_sam_tpu.train import warmup_multistep


def ref_warmup_multistep(step, base_lr, milestones, gamma, wf, wi):
    """Direct transcription of the reference LR rule
    (pc_sam/optim/lr_scheduler.py:36-78)."""
    import bisect

    if step >= wi:
        factor = 1.0
    else:
        alpha = step / wi
        factor = wf * (1 - alpha) + alpha
    return base_lr * factor * gamma ** bisect.bisect_right(milestones, step)


class TestSchedule:
    def test_matches_reference_rule(self):
        sched = warmup_multistep(3e-4, [30, 60], gamma=0.1,
                                 warmup_factor=0.001, warmup_iters=10)
        for step in [0, 1, 5, 9, 10, 11, 29, 30, 31, 59, 60, 61, 100]:
            want = ref_warmup_multistep(step, 3e-4, [30, 60], 0.1, 0.001, 10)
            got = float(sched(step))
            np.testing.assert_allclose(got, want, rtol=1e-6, err_msg=str(step))

    def test_rejects_unsorted_milestones(self):
        with pytest.raises(ValueError):
            warmup_multistep(1e-3, [60, 30])


def make_batch(rng, B=4, N=192, M=2):
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    coords /= np.abs(coords).max() + 1e-3
    feats = rng.random((B, N, 3)).astype(np.float32)
    gt = np.zeros((B, M, N), bool)
    for b in range(B):
        for m in range(M):
            d = ((coords[b] - coords[b, rng.integers(N)]) ** 2).sum(-1)
            gt[b, m] = d < np.quantile(d, 0.3)
    return dict(coords=jnp.asarray(coords), features=jnp.asarray(feats),
                gt_masks=jnp.asarray(gt))


@pytest.fixture(scope="module")
def setup():
    cfg = PointSAMConfig(vit="tiny", tokenizer=TokenizerConfig(16, 8),
                         prompt_iters=2)
    model = PointCloudSAM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=8)  # divisible by the 8-device test mesh
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        batch["coords"], batch["features"], batch["gt_masks"],
    )
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}
    return model, params, buffers, batch


class TestTrainStep:
    def test_mesh_step_runs_and_updates(self, setup):
        model, params, buffers, batch = setup
        mesh = make_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 virtual devices
        tx = make_optimizer(warmup_multistep(1e-3, [100], warmup_iters=5))
        state = TrainState.create(params, buffers, tx)
        step_fn = make_train_step(model, tx, mesh, donate=False)
        with mesh:
            state_r = replicate(state, mesh)
            b = shard_batch(batch, mesh)
            rng = jax.device_put(
                jax.random.PRNGKey(0),
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            )
            new_state, metrics = step_fn(state_r, b, rng)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params actually changed
        d = jax.tree_util.tree_map(
            lambda a, b_: float(jnp.abs(a - b_).max()), state.params,
            jax.device_get(new_state.params),
        )
        assert max(jax.tree_util.tree_leaves(d)) > 0

    def test_grad_accum_matches_full_batch(self, setup):
        """accum_steps=2 over the same data must match the single-step
        gradient (same total loss => same update under equal averaging)."""
        model, params, buffers, batch = setup
        tx = optax.sgd(1e-2)  # linear optimizer: updates == -lr * grads

        state = TrainState.create(params, buffers, tx)
        step1 = make_train_step(model, tx, accum_steps=1, donate=False)
        step2 = make_train_step(model, tx, accum_steps=2, donate=False)
        rng = jax.random.PRNGKey(3)

        # Same per-microbatch sampler rngs are impossible to align exactly
        # (accum path splits the rng); instead disable the stochastic part
        # by using is_eval-free fixed sampling: the fixed sampler is
        # deterministic, so only the refinement-iteration rng differs. Use
        # prompt_iters=2: the only refinement iteration is the last (static),
        # so the sampler rng is unused and gradients must match exactly.
        s1, m1 = step1(state, batch, rng)
        s2, m2 = step2(state, batch, rng)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b_: float(jnp.abs(a - b_).max()),
            jax.device_get(s1.params), jax.device_get(s2.params),
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    def test_optimizer_clips_gradients(self):
        tx = make_optimizer(lambda s: 1.0, max_grad_value=1.0,
                            weight_decay=0.0)
        params = {"w": jnp.zeros(3)}
        opt_state = tx.init(params)
        grads = {"w": jnp.asarray([5.0, -7.0, 0.5])}
        updates, _ = tx.update(grads, opt_state, params)
        # after clip to [-1, 1], adam normalizes: sign preserved, |u| ~ lr
        assert float(jnp.abs(updates["w"]).max()) <= 1.0 + 1e-6


class TestGraftEntry:
    def test_entry_compiles_tiny(self, monkeypatch):
        """entry() on the flagship is heavy for CI; validate the plumbing by
        compiling the same path on the tiny preset."""
        from point_sam_tpu.models import init_variables

        cfg = PointSAMConfig(vit="tiny", tokenizer=TokenizerConfig(16, 8),
                             prompt_iters=2)
        model = PointCloudSAM(cfg)
        variables = init_variables(model, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        coords = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32) / 2)
        feats = jnp.asarray(rng.random((1, 128, 3)).astype(np.float32))

        fwd = jax.jit(lambda v, c, f, pc, pl: model.apply(
            v, c, f, pc, pl, method=model.predict_masks))
        masks, ious = fwd(variables, coords, feats, coords[:, :1],
                          jnp.ones((1, 1), bool))
        assert masks.shape == (1, 3, 128)
