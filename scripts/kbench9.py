"""Round-5 perf probe #9: fused FPS+3NN kernel vs the two-pass geometry.

VERDICT r4 #2: knn_interp is two separate distance sweeps. The fused
kernel (ops/fps_pallas.fps_interp_pallas) folds the 3-NN interp search
into the FPS selection loop, whose stage-2 distance fields already cover
every (center, point) pair. This probe measures, on the real chip at the
flagship shape (B=1, N=100k, G=2048):

  p_fps          fps_pallas alone (the r4 baseline stage)
  p_interp       interp_weights_pallas alone (the pass being eliminated)
  p_fused        fps_interp_pallas (selection + 3-NN in one kernel)

Win condition: p_fused < p_fps + p_interp by a margin (the insertion VPU
work must hide under the selection loop's reduction latencies).

Correctness gate runs first: fused selections must be bit-exact vs
fps_pallas and the 3-NN triplet bit-exact vs interp_weights_pallas.

Timing: scan-slope between ITERS_A and ITERS_B over distinct inputs.
Resumable: /tmp/kbench9_state.json. Run serialized (single-core host).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH9_STATE", "/tmp/kbench9_state.json")

N, G = 100_000, 2048
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

    from point_sam_tpu.ops.fps import fps_xla
    from point_sam_tpu.ops.fps_pallas import fps_interp_pallas, fps_pallas
    from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

    # -------------------------------------------------- correctness gate
    def correctness():
        pts = jnp.asarray(rng.standard_normal((1, N, 3)), jnp.float32)
        fi, idx, d2 = fps_interp_pallas(pts, G)
        want = np.asarray(fps_pallas(pts, G))
        fps_ok = bool(np.array_equal(np.asarray(fi), want))
        want_x = np.asarray(fps_xla(pts, G))
        xla_ok = bool(np.array_equal(want, want_x))
        centers = jnp.take_along_axis(pts, jnp.asarray(want)[..., None],
                                      axis=1)
        wi, ww = interp_weights_pallas(pts, centers)
        imatch = float((np.asarray(idx) == np.asarray(wi)).mean())
        inv = 1.0 / np.maximum(np.asarray(d2, np.float64), 1e-8)
        w = inv / inv.sum(-1, keepdims=True)
        wdiff = float(np.abs(w - np.asarray(ww, np.float64)).max())
        return {"fps_bit_exact": fps_ok, "fps_vs_xla": xla_ok,
                "idx_match": imatch, "w_diff": wdiff}

    ok = stage("correctness", correctness)
    if not (ok and ok["fps_bit_exact"] and ok["idx_match"] == 1.0):
        print("# correctness gate FAILED — not timing", flush=True)
        return

    # -------------------------------------------------- scan-slope timing
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

    stage("p_fps", lambda: slope_time(lambda p: fps_pallas(p, G), pstack))
    stage("p_interp", lambda: slope_time(
        lambda p: interp_weights_pallas(p, p[:, :G]), pstack))
    stage("p_fused", lambda: slope_time(
        lambda p: fps_interp_pallas(p, G), pstack))

    f, i, fu = state.get("p_fps"), state.get("p_interp"), state.get("p_fused")
    if f and i and fu:
        print(f"# two-pass total {1e3*(f+i):.3f} ms vs fused {1e3*fu:.3f} ms "
              f"(delta {1e3*(f+i-fu):+.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
