"""Round-5 perf probe #13: whole-geometry fusion (fps_interp_knn_pallas).

Measures the ONE-kernel geometry pass (FPS + centers + 3-NN interp +
binned kNN) against the round-4 composed path (fps_with_interp kernel +
centers gather + approx_min_k kNN) at the flagship eval shape
B=1 N=100k G=2048 K=256.

  t_composed   fps_with_interp + batch_index_select + knn(approx, rt=0.9)
  t_fused      fps_interp_knn_pallas (incl. the caller-side top_k over
               4096 bins + centers gather)

Resumable: /tmp/kbench13_state.json. Run serialized (single-core host).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH13_STATE", "/tmp/kbench13_state.json")

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

    from point_sam_tpu.ops import batch_index_select, fps_with_interp, knn
    from point_sam_tpu.ops.fps_pallas import fps_interp_knn_pallas

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

    def istack(iters):
        pts = np.asarray(rng.standard_normal((iters, 1, N, 3)), np.float32)
        return jnp.asarray(pts)

    def composed(p):
        fps_idx, iidx, iw = fps_with_interp(p, G)
        c = batch_index_select(p, fps_idx, axis=1)
        _, ki = knn(c, p, K, method="approx", recall_target=0.9)
        return fps_idx, c, iidx, iw, ki

    stage("t_composed", lambda: slope_time(composed, istack))

    def fused(p):
        fps_idx, c, iidx, d2, ki = fps_interp_knn_pallas(p, G, K)
        inv = 1.0 / jnp.maximum(d2, 1e-8)
        iw = inv / jnp.sum(inv, axis=-1, keepdims=True)
        return fps_idx, c, iidx, iw, ki

    stage("t_fused", lambda: slope_time(fused, istack))


if __name__ == "__main__":
    main()
