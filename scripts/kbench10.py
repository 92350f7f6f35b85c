"""Round-5 perf probe #10: attribute the residual geometry glue.

Post fused-FPS+interp (BENCH r5 interim: geom 7.3 ms at B=1), the stage
composition should be fused 3.32 + knn ?? + glue ??. kbench8's g_knn probe
failed (state null), so the kNN cost at the flagship shape has only the r3
calibration (2.34 ms on a clustered cloud). This probe times, on the real
chip at B=1, N=100k, G=2048, K=256 (standard_normal cloud, the bench's
distribution):

  g_knn        ops.knn approx rt=0.9 (the production tokenizer call)
  g_fused      fps_interp_pallas + weight normalization (wrapper overhead)
  g_geom       the full compute_geometry (should equal the bench's
               fps+knn_interp stage sum; glue = geom - fused - knn covers
               the centers gather and layout conversions)

Timing: scan-slope between 4 and 12 iterations over distinct inputs.
Resumable: /tmp/kbench10_state.json. Run serialized (single-core host).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH10_STATE", "/tmp/kbench10_state.json")

N, G, K = 100_000, 2048, 256
ITERS_A, ITERS_B = 4, 12


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    try:
        with open(STATE_PATH) as f:
            state = json.load(f)
    except Exception:
        state = {}

    def stage(key, fn):
        if key not in state:
            try:
                state[key] = fn()
            except Exception as exc:
                state[key] = None
                print(f"# {key}: FAILED {type(exc).__name__}: {exc}"[:300],
                      flush=True)
            with open(STATE_PATH, "w") as f:
                json.dump(state, f)
        if state[key] is not None:
            v = state[key]
            print(f"# {key}: {v*1e3:.3f} ms" if isinstance(v, float)
                  else f"# {key}: {v}", flush=True)
        return state[key]

    rng = np.random.default_rng(0)

    from point_sam_tpu.models.tokenizer import TokenizerConfig, compute_geometry
    from point_sam_tpu.ops import batch_index_select, fps_with_interp, knn

    tok = TokenizerConfig(num_patches=G, patch_size=K)

    def slope_time(fn, make_stack):
        def run(iters):
            stacks = make_stack(iters)

            @jax.jit
            def many(ss):
                def step(c, x):
                    out = fn(x)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                                   for v in leaves), None
                c, _ = jax.lax.scan(step, jnp.float32(0), ss)
                return c

            float(many(stacks))
            float(many(stacks))
            return min(_timeit(lambda: float(many(stacks))) for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    def pstack(iters):
        return jnp.asarray(rng.standard_normal((iters, 1, N, 3)), jnp.float32)

    def cstack(iters):
        # (cloud, centers) pytree for the knn-only probe; lax.scan carries
        # both with a shared leading iters axis.
        pts = pstack(iters)
        return pts, pts[:, :, :G]

    stage("g_knn", lambda: slope_time(
        lambda x: knn(x[1], x[0], K, method="approx", recall_target=0.9),
        cstack))
    stage("g_fused", lambda: slope_time(
        lambda p: fps_with_interp(p, G), pstack))
    stage("g_geom", lambda: slope_time(
        lambda p: tuple(compute_geometry(p, tok).values()), pstack))

    g_knn, g_fused, g_geom = (state.get(k) for k in
                              ("g_knn", "g_fused", "g_geom"))
    if g_knn and g_fused and g_geom:
        print(f"# glue = geom - fused - knn = "
              f"{1e3*(g_geom - g_fused - g_knn):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
