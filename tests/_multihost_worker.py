"""Worker for the 2-process CPU multihost test (tests/test_multihost.py).

Each process joins a jax.distributed group over localhost, builds the SAME
tiny model + synthetic global batch from fixed seeds, feeds its
process-shard through the mesh train step, and dumps {loss, param digest}
to a JSON file. The parent asserts both processes agree with each other
AND with a single-process run of the identical global computation — the
multihost equivalent of "DDP grads match single-GPU" for the reference's
accelerate launch path (train.py:163-176).

Usage: python tests/_multihost_worker.py <pid> <nproc> <port> <out.json>
      [param_sharding]
(nproc=1 skips distributed init entirely = the single-process oracle;
param_sharding defaults to "replicated" = DDP; "fsdp" shards params +
optimizer state over the data axis — the layout giant training uses).
"""

import json
import sys


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    param_sharding = sys.argv[5] if len(sys.argv) > 5 else "replicated"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: each worker is a fresh process, and the
    # tiny train step still costs minutes of XLA:CPU compile without it
    # (round-3 suite-time blowup, VERDICT #5).
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if nproc > 1:
        # Generous shutdown barrier: this host has ONE CPU core, so when the
        # full suite is busy one worker can finish its step minutes before
        # the other finishes compiling. The default 300 s shutdown barrier
        # then times out (DEADLINE_EXCEEDED, 1/2 tasks at barrier) — the
        # round-4 full-suite flake. 1200 s comfortably exceeds the parent's
        # per-worker communicate() budget, so a real hang still fails there.
        jax.distributed.initialize(
            f"localhost:{port}", nproc, pid,
            initialization_timeout=600,
            shutdown_timeout_seconds=1200,
        )

    import jax.numpy as jnp
    import numpy as np

    from point_sam_tpu.datasets.build import BatchIterator
    from point_sam_tpu.models import (PointCloudSAM, PointSAMConfig,
                                      TokenizerConfig, criterion)
    from point_sam_tpu.parallel import (TrainState, make_mesh, make_optimizer,
                                        make_train_step, replicate,
                                        shard_batch)
    from point_sam_tpu.train.schedule import warmup_multistep

    assert jax.device_count() == 4, jax.devices()

    model = PointCloudSAM(PointSAMConfig(
        vit="tiny", tokenizer=TokenizerConfig(16, 8), prompt_iters=2))

    # Deterministic synthetic dataset: global order is seeded identically
    # in every process; BatchIterator slices the per-process range.
    B, N, M = 4, 256, 1

    class SynthDS:
        def __len__(self):
            return 8

        def get(self, i, rng=None):
            g = np.random.default_rng(1000 + i)
            return {
                "coords": g.standard_normal((N, 3)).astype(np.float32) / 3,
                "features": g.random((N, 3)).astype(np.float32),
                "gt_masks": (g.random((M, N)) < 0.3),
            }

    it = BatchIterator(SynthDS(), B, shuffle=True, drop_last=True, seed=7,
                       num_workers=0, process_index=pid, process_count=nproc)
    batch_np = next(iter(it))

    sched = warmup_multistep(1e-3, [100], warmup_iters=2)
    tx = make_optimizer(sched, weight_decay=0.0, max_grad_value=1.0)
    mesh = make_mesh()

    def init_fn(k0, k1, b):
        return model.init({"params": k0, "sampler": k1},
                          b["coords"], b["features"], b["gt_masks"])

    # Init must see identical shapes/values in every process: use a
    # deterministic host batch of GLOBAL batch size (shapes only matter).
    g = np.random.default_rng(0)
    init_batch = {
        "coords": jnp.asarray(
            g.standard_normal((B, N, 3)).astype(np.float32) / 3),
        "features": jnp.asarray(g.random((B, N, 3)).astype(np.float32)),
        "gt_masks": jnp.asarray(g.random((B, M, N)) < 0.3),
    }
    variables = jax.jit(init_fn)(jax.random.PRNGKey(11),
                                 jax.random.PRNGKey(12), init_batch)
    variables = jax.device_get(variables)
    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState.create(params, buffers, tx)
    if param_sharding == "fsdp":
        # Shard from identical full host copies: every process builds the
        # same state from fixed seeds, so device_put to the global FSDP
        # sharding is well-defined. min_elements lowered so the tiny
        # model's medium leaves actually shard across the 4 devices.
        from point_sam_tpu.parallel.fsdp import fsdp_place

        state = fsdp_place(state, mesh)
    else:
        state = replicate(state, mesh)

    step_fn = make_train_step(model, tx, mesh, accum_steps=1,
                              param_sharding=param_sharding,
                              state_example=TrainState.create(
                                  params, buffers, tx),
                              criterion=criterion)
    with mesh:
        batch = shard_batch(batch_np, mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(13))

    loss = float(jax.device_get(metrics["loss"]))
    # Param digest via a jitted replicated-output reduction: under FSDP the
    # post-step params are sharded across processes and cannot be
    # device_get directly.
    from jax.sharding import NamedSharding, PartitionSpec as P

    digest_fn = jax.jit(
        lambda p: sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(p)
        ),
        out_shardings=NamedSharding(mesh, P()),
    )
    digest = float(jax.device_get(digest_fn(state.params)))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "nproc": nproc, "loss": loss,
                   "digest": digest, "param_sharding": param_sharding}, f)
    print(f"worker {pid}/{nproc} [{param_sharding}]: "
          f"loss={loss:.6f} digest={digest:.6f}")


if __name__ == "__main__":
    main()
