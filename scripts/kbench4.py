"""Round-3 perf probes #4: batched (B=16) per-stage encode breakdown.

The headline metric is batched throughput (encode_b16 = 33.8 ms/cloud in
BENCH_r02) but the only per-stage numbers so far are B=1. Stages here
(flagship ViT-L eval config, N=100k, G=2048, K=256):

  fps_b16 / geom_b16          geometry at B=16 (per cloud)
  embed_b1 / embed_b16        group+PointNet (per cloud)
  rest_b1 / rest_b16          embed + ViT + out_proj (per cloud)
  group_b1 / group_b16        the neighbor gather alone (per cloud)
  pe_b1                       fused PointNet on PRE-gathered patches
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH4_STATE", "/tmp/kbench4_state.json")


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from point_sam_tpu.models import (
        PointCloudSAM,
        PointSAMConfig,
        TokenizerConfig,
        init_variables,
    )
    from point_sam_tpu.ops import fps, group_points

    try:
        with open(STATE_PATH) as f:
            state = json.load(f)
    except Exception:
        state = {}

    def stage(key, fn):
        if key not in state:
            state[key] = fn()
            with open(STATE_PATH, "w") as f:
                json.dump(state, f)
        print(f"# {key}: {state[key]}", flush=True)
        return state[key]

    N, G, K = 100_000, 2048, 256
    REPS = 3
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    tok = TokenizerConfig(num_patches=G, patch_size=K)
    cfg = PointSAMConfig(vit="eva02_large", tokenizer=tok, prompt_iters=5,
                         vit_remat=False)
    model = PointCloudSAM(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    def timed_scan(fn, *stacks):
        @jax.jit
        def many(consts, *ss):
            def step(c, xs):
                out = fn(consts, *xs)
                leaves = jax.tree_util.tree_leaves(out)
                return (c + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                                for x in leaves), None)
            c, _ = jax.lax.scan(step, jnp.float32(0), ss)
            return c
        float(many(variables, *stacks))
        float(many(variables, *stacks))
        best = min(_timeit(lambda: float(many(variables, *stacks)))
                   for _ in range(REPS))
        return best / stacks[0].shape[0]

    geom_fn = jax.jit(lambda c: model.make_geometry(c))

    def make_inputs(iters, b):
        cs = jnp.asarray(
            rng.standard_normal((iters, b, N, 3)).astype(np.float32) / 3.0)
        fs = jnp.asarray(rng.random((iters, b, N, 3)).astype(np.float32))
        return cs, fs

    def geom_stack(cs):
        geoms = [geom_fn(cs[i]) for i in range(cs.shape[0])]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *geoms)

    # ---------------- B=1
    I1 = 12
    c1, f1 = make_inputs(I1, 1)
    g1 = geom_stack(c1)

    stage("embed_b1", lambda: timed_scan(
        lambda v, c, f, g: model.apply(
            v, c, f, g, method=lambda m, a, b_, gg: m.patch_embed(a, b_, gg)),
        c1, f1, g1))
    stage("rest_b1", lambda: timed_scan(
        lambda v, c, f, g: model.apply(v, c, f, g, method=model.encode)[0],
        c1, f1, g1))
    stage("group_b1", lambda: timed_scan(
        lambda v, c, f, g: group_points(c, f, g["centers"], g["knn_idx"]),
        c1, f1, g1))

    # fused PointNet on pre-gathered patches
    patches1 = jnp.stack([
        jax.jit(lambda c, f, g: group_points(c, f, g["centers"], g["knn_idx"]))(
            c1[i], f1[i], jax.tree_util.tree_map(lambda x: x[i], g1))
        for i in range(I1)
    ])

    from point_sam_tpu.models.patch_encoder import PatchEncoder

    pe_mod = PatchEncoder(cfg.patch_embed_channels, (128, 512),
                          dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    pe_vars = {"params": variables["params"]["patch_embed"]["patch_encoder"]}

    def pe_apply(v, p):
        return pe_mod.apply(
            {"params": v["params"]["patch_embed"]["patch_encoder"]}, p)

    del pe_vars
    stage("pe_b1", lambda: timed_scan(pe_apply, patches1))
    del patches1

    # ---------------- B=16
    I16 = 8
    c16, f16 = make_inputs(I16, 16)

    stage("fps_b16", lambda: timed_scan(
        lambda v, c, f: fps(c, G), c16, f16) / 16)
    stage("geom_b16", lambda: timed_scan(
        lambda v, c, f: tuple(model.make_geometry(c).values()), c16, f16) / 16)

    g16 = geom_stack(c16)
    stage("group_b16", lambda: timed_scan(
        lambda v, c, f, g: group_points(c, f, g["centers"], g["knn_idx"]),
        c16, f16, g16) / 16)
    stage("embed_b16", lambda: timed_scan(
        lambda v, c, f, g: model.apply(
            v, c, f, g, method=lambda m, a, b_, gg: m.patch_embed(a, b_, gg)),
        c16, f16, g16) / 16)
    stage("rest_b16", lambda: timed_scan(
        lambda v, c, f, g: model.apply(v, c, f, g, method=model.encode)[0],
        c16, f16, g16) / 16)

    print(json.dumps(state))


if __name__ == "__main__":
    main()
