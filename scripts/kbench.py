"""kNN/geometry micro-benchmark on the real TPU (round-3 perf work).

Decomposes bench.py's `geom` stage (fps + kNN + interp) and measures
candidate kNN merge strategies at the flagship shape (G=2048 queries,
N=100k keys, K=256 neighbors, recall_target=0.9):

  - knn_cur:        current approx_min_k(aggregate_to_topk=True)
  - agg_false:      approx_min_k(aggregate_to_topk=False) alone (+ L shape)
  - agg_topk:       agg=False + lax.top_k over the L candidates
  - interp_cur:     3-NN interp weights (Pallas on TPU)

Methodology identical to bench.py: scan over ITERS distinct inputs inside
one jit, scalar checksum readback, min over REPS; resumable state file.
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH_STATE", "/tmp/kbench_state.json")


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

    from point_sam_tpu.ops import fps
    from point_sam_tpu.ops.distance import sq_dist
    from point_sam_tpu.ops.interp import compute_interp_weights
    from point_sam_tpu.ops.knn import knn

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
    ITERS, REPS = 12, 3
    rng = np.random.default_rng(0)

    coords = jnp.asarray(
        rng.standard_normal((ITERS, 1, N, 3)).astype(np.float32) / 3.0
    )
    # Pre-compute centers once per iter (FPS cost excluded from kNN timing).
    fps_fn = jax.jit(lambda c: fps(c, G))
    centers = jnp.stack([
        jnp.take_along_axis(coords[i], fps_fn(coords[i])[..., None], axis=1)
        for i in range(ITERS)
    ])

    def timed_scan(fn, *stacks):
        @jax.jit
        def many(*ss):
            def step(c, xs):
                out = fn(*xs)
                leaves = jax.tree_util.tree_leaves(out)
                return (
                    c + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                            for x in leaves),
                    None,
                )

            c, _ = jax.lax.scan(step, jnp.float32(0), ss)
            return c

        float(many(*stacks))
        float(many(*stacks))
        best = min(_timeit(lambda: float(many(*stacks))) for _ in range(REPS))
        return best / stacks[0].shape[0]

    # --- what L does agg=False produce at this shape/recall?
    def probe_L(recall):
        d2 = sq_dist(centers[0], coords[0])
        d, i = jax.lax.approx_min_k(
            d2, K, recall_target=recall, aggregate_to_topk=False)
        return int(d.shape[-1])

    L90 = stage("L_r90", lambda: probe_L(0.9))
    L80 = stage("L_r80", lambda: probe_L(0.8))
    L70 = stage("L_r70", lambda: probe_L(0.7))

    # --- current full approx path
    stage("knn_cur_r90", lambda: timed_scan(
        lambda q, kk: knn(q, kk, K, method="approx", recall_target=0.9),
        centers, coords))

    # --- partial reduction only
    def agg_false(q, kk, recall):
        d2 = sq_dist(q, kk)
        return jax.lax.approx_min_k(
            d2, K, recall_target=recall, aggregate_to_topk=False)

    stage("agg_false_r90", lambda: timed_scan(
        lambda q, kk: agg_false(q, kk, 0.9), centers, coords))

    # --- agg=False + lax.top_k merge
    def agg_then_topk(q, kk, recall):
        d, i = agg_false(q, kk, recall)
        negd, sel = jax.lax.top_k(-d, K)
        return -negd, jnp.take_along_axis(i, sel, axis=-1)

    stage("agg_topk_r90", lambda: timed_scan(
        lambda q, kk: agg_then_topk(q, kk, 0.9), centers, coords))

    # --- lower recall targets, full path (L shrinks -> cheaper merge)
    stage("knn_cur_r80", lambda: timed_scan(
        lambda q, kk: knn(q, kk, K, method="approx", recall_target=0.8),
        centers, coords))

    # --- interp
    stage("interp_cur", lambda: timed_scan(
        lambda q, kk: compute_interp_weights(kk, q), centers, coords))

    # --- fps for reference
    stage("fps_b1", lambda: timed_scan(lambda q, kk: fps(kk, G),
                                       centers, coords))

    print(json.dumps(state))


if __name__ == "__main__":
    main()
