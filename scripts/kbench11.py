"""Round-5 perf probe #11: localize the ~2.9 ms compute_geometry glue.

kbench10 measured (B=1, N=100k, G=2048, K=256, standard_normal):
  fps_with_interp 3.04 ms, approx kNN 1.61 ms, compute_geometry 7.57 ms
so ~2.9 ms appears only when the two are composed. Ablations, all timed
with the same scan-slope harness:

  a_fused      fps_with_interp alone                      (expect ~3.0)
  b_knn        knn on sliced centers coords[:, :G]        (expect ~1.6)
  c_manual     fused + gather(centers) + knn(centers)     (= compute_geometry
               body; expect ~7.5 — reproduces the glue)
  d_indep      fused + knn on SLICED centers, same jit,   (if ~4.7: the glue
               no data dependency between them             is the gather->knn
                                                           dependency; if
                                                           ~7.5: coexistence)
  e_gather_knn gather centers from a PRECOMPUTED fps_idx  (isolates whether a
               + knn                                       gathered [G,3] query
                                                           slows the kNN)

Resumable: /tmp/kbench11_state.json. Run serialized (single-core host).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH11_STATE", "/tmp/kbench11_state.json")

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

    def istack(iters):
        # (cloud, precomputed fps_idx) for e_gather_knn.
        pts = np.asarray(rng.standard_normal((iters, 1, N, 3)), np.float32)
        idx = np.stack([
            rng.choice(N, size=(1, G), replace=False).astype(np.int32)
            for _ in range(iters)])
        return jnp.asarray(pts), jnp.asarray(idx)

    kw = dict(method="approx", recall_target=0.9)

    stage("a_fused", lambda: slope_time(
        lambda p: fps_with_interp(p, G), pstack))
    stage("b_knn", lambda: slope_time(
        lambda p: knn(p[:, :G], p, K, **kw), pstack))

    def manual(p):
        fps_idx, idx, w = fps_with_interp(p, G)
        centers = batch_index_select(p, fps_idx, axis=1)
        _, knn_idx = knn(centers, p, K, **kw)
        return fps_idx, idx, w, centers, knn_idx

    stage("c_manual", lambda: slope_time(manual, pstack))

    def indep(p):
        fps_idx, idx, w = fps_with_interp(p, G)
        _, knn_idx = knn(p[:, :G], p, K, **kw)
        return fps_idx, idx, w, knn_idx

    stage("d_indep", lambda: slope_time(indep, pstack))

    def gather_knn(x):
        p, fps_idx = x
        centers = batch_index_select(p, fps_idx, axis=1)
        _, knn_idx = knn(centers, p, K, **kw)
        return centers, knn_idx

    stage("e_gather_knn", lambda: slope_time(gather_knn, istack))

    def gather_barrier_knn(x):
        p, fps_idx = x
        centers = batch_index_select(p, fps_idx, axis=1)
        centers = jax.lax.optimization_barrier(centers)
        _, knn_idx = knn(centers, p, K, **kw)
        return centers, knn_idx

    stage("f_gather_barrier_knn", lambda: slope_time(gather_barrier_knn,
                                                     istack))

    def manual_barrier(p):
        fps_idx, idx, w = fps_with_interp(p, G)
        centers = batch_index_select(p, fps_idx, axis=1)
        centers = jax.lax.optimization_barrier(centers)
        _, knn_idx = knn(centers, p, K, **kw)
        return fps_idx, idx, w, centers, knn_idx

    stage("g_manual_barrier", lambda: slope_time(manual_barrier, pstack))

    keys = ("a_fused", "b_knn", "c_manual", "d_indep", "e_gather_knn")
    a, b, c, d, e = (state.get(k) for k in keys)
    if all(v is not None for v in (a, b, c, d)):
        print(f"# c - (a+b) [glue reproduced]   = {1e3*(c-a-b):+.3f} ms")
        print(f"# d - (a+b) [coexistence cost]  = {1e3*(d-a-b):+.3f} ms")
        if e is not None:
            print(f"# e - b     [gathered-query cost] = {1e3*(e-b):+.3f} ms")


if __name__ == "__main__":
    main()
