"""Round-5 perf probe #14: attribute fps_interp_knn_pallas's 13.7 ms.

kbench13: fused 13.73 ms vs composed 7.19 ms. Suspects: (a) the per-step
kNN bin fold inside the selection loop (25-chunk min-tree, int32 carry),
(b) the caller-side exact top_k over [G, 4096] bins (lax.top_k lowers to
a full sort on TPU), (c) the 67 MB cd/ci VMEM residency throttling the
pipeline.

  t_kernel_only   pallas_call outputs summed, NO top_k tail
  t_topk_tail     lax.top_k(256) + gather on precomputed [1, G, 4096]
  t_approx_tail   lax.approx_min_k(256, aggregate_to_topk) same input
  t_sort_tail     lax.sort_key_val full-sort alternative

Resumable: /tmp/kbench14_state.json.
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH14_STATE", "/tmp/kbench14_state.json")

N, G, K = 100_000, 2048, 256
BINS = 4096
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
        return jnp.asarray(
            np.asarray(rng.standard_normal((iters, 1, N, 3)), np.float32))

    def cdstack(iters):
        cd = np.abs(rng.standard_normal((iters, 1, G, BINS))).astype(
            np.float32)
        ci = rng.integers(0, N, (iters, 1, G, BINS)).astype(np.int32)
        return jnp.asarray(cd), jnp.asarray(ci)

    # (a) kernel-only: call the raw pallas primitive path via the public
    # wrapper but sum the bin buffers instead of running top_k. Rebuild the
    # call here to bypass the wrapper's tail.
    def kernel_only(p):
        from point_sam_tpu.ops import fps_pallas as FP
        # reuse the wrapper but truncate: cheapest is to call it and only
        # consume fps_idx + interp outputs — XLA dead-codes the top_k.
        fps_idx, ctr, iidx, d2, _ = FP.fps_interp_knn_pallas(p, G, K)
        return fps_idx, iidx, d2

    stage("t_kernel_noknn_dce", lambda: slope_time(kernel_only, istack))

    def full(p):
        from point_sam_tpu.ops import fps_pallas as FP
        return FP.fps_interp_knn_pallas(p, G, K)

    stage("t_full", lambda: slope_time(full, istack))

    def topk_tail(x):
        cd, ci = x
        negd, pos = jax.lax.top_k(-cd.reshape(1, G, BINS), K)
        return jnp.take_along_axis(ci.reshape(1, G, BINS), pos, axis=-1)

    stage("t_topk_tail", lambda: slope_time(topk_tail, cdstack))

    def approx_tail(x):
        cd, ci = x
        negd, pos = jax.lax.approx_min_k(
            cd.reshape(1, G, BINS), K, aggregate_to_topk=True)
        return jnp.take_along_axis(ci.reshape(1, G, BINS), pos, axis=-1)

    stage("t_approx_tail", lambda: slope_time(approx_tail, cdstack))

    def sort_tail(x):
        cd, ci = x
        sd, si = jax.lax.sort_key_val(
            cd.reshape(1, G, BINS), ci.reshape(1, G, BINS), dimension=-1)
        return si[..., :K]

    stage("t_sort_tail", lambda: slope_time(sort_tail, cdstack))


if __name__ == "__main__":
    main()
