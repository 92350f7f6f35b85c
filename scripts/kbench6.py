"""Round-3 probe #6: decompose the knn_interp regression (9.42 ms in
BENCH_r03 vs 6.58 in r02).

Suspects:
  1. the internal recall bump rt_eff = rt + 0.5*(1-rt) (ops/knn.py:140),
     calibrated for the (now-removed) full-bf16 distance noise, makes
     approx_min_k search a HIGHER recall than r2 did (0.9 -> 0.95
     effective at the evaluator's operating point);
  2. the fp32 combination (q2 - 2qk + k2 in fp32) writes fp32
     intermediates where full-bf16 wrote bf16 — more HBM traffic than the
     all-fp32 r2 path? (should not be: inputs are half the bytes);
  3. the 3-NN interp share grew.

Stages (flagship eval shape, B=1 and B=16, G=2048, N=100k, K=256),
timed by scan-slope (iters 4 vs 12) like bench.py:

  knn_<path>_rt<r>   the tokenizer kNN search alone
  raw_*              approx_min_k bypassing the wrapper — CAVEAT: the
                     "fp32" label means default matmul precision, which
                     the MXU truncates to bf16 (that is WHY fp32 and bf16
                     raw timings match, and why both are recall-broken on
                     clustered scenes at this shape — see prec_* below)
  prec_<p>_rt<r>     the wrapper's einsum at explicit precision
                     default/high/highest — the round-3 calibration that
                     set _approx_knn's "high" operating point
  interp_b1          3-NN interp weights alone (query=100k, key=2048)

Findings (v5e, clustered cloud): default 1.64 ms / recall-vs-exact 0.512
(broken), high 2.34 ms / 0.9614, highest 3.61 ms / 0.9617. rt bump
removed: approx cost is super-linear in the target (0.9 -> 0.95 costs
~4x). See ops/knn.py::_approx_knn docstring for the shipped conclusion.
"""

from __future__ import annotations

import functools
import json
import os
import time

STATE_PATH = os.environ.get("KBENCH6_STATE", "/tmp/kbench6_state.json")


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
            state[key] = fn()
            with open(STATE_PATH, "w") as f:
                json.dump(state, f)
        print(f"# {key}: {state[key]}", flush=True)
        return state[key]

    N, G, K = 100_000, 2048, 256
    # Resumable state is keyed by the probe shape: editing the shapes
    # invalidates the cache instead of silently replaying stale numbers.
    shape_tag = f"N{N}_G{G}_K{K}"
    if state.get("_shape", shape_tag) != shape_tag:
        state = {}
    state["_shape"] = shape_tag
    rng = np.random.default_rng(0)

    def scan_slope(fn, stacks_lo, stacks_hi, lo=4, hi=12):
        """Wall time per iteration from the slope between two scan lengths
        over DISTINCT inputs (bench.py methodology, tunnel-floor-free)."""

        def many(*ss):
            def step(c, xs):
                return c + fn(*xs), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), ss)
            return out

        j = jax.jit(many)

        def run(ss):
            float(j(*ss))  # warm/compile
            best = float("inf")
            for _ in range(3):  # min-of-3 damps tunnel jitter
                t0 = time.perf_counter()
                float(j(*ss))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = run(stacks_lo), run(stacks_hi)
        return (t_hi - t_lo) / (hi - lo)

    def mk(b, iters, seed):
        r = np.random.default_rng(seed)
        # clustered-ish cloud: mixture of gaussians in the unit ball
        centers = r.standard_normal((b, 64, 3)) * 0.4
        pick = r.integers(0, 64, size=(b, N))
        pts = centers[np.arange(b)[:, None], pick] + r.standard_normal(
            (b, N, 3)) * 0.05
        cloud = jnp.asarray(pts, jnp.float32)
        qidx = r.integers(0, N, size=(b, G))
        q = jnp.asarray(pts[np.arange(b)[:, None], qidx], jnp.float32)
        # stacks of distinct inputs for the scan
        ks = jnp.stack([cloud + 1e-3 * i for i in range(iters)])
        qs = jnp.stack([q + 1e-3 * i for i in range(iters)])
        return qs, ks

    from point_sam_tpu.ops.knn import knn

    def knn_fn(method, rt):
        def f(q, kk):
            d, i = knn(q, kk, K, method=method, recall_target=rt)
            return jnp.sum(d.astype(jnp.float32)) + jnp.sum(
                i.astype(jnp.float32))

        return f

    for b in (1, 16):
        lo_in, hi_in = mk(b, 4, 1), mk(b, 12, 2)
        for rt in (0.80, 0.90, 0.95):
            stage(
                f"knn_approx_rt{rt}_b{b}",
                functools.partial(
                    scan_slope, knn_fn("approx", rt), lo_in, hi_in),
            )

    # Bypass the internal bump: call approx_min_k directly at the raw rt.
    def raw_approx(rt, bf16_inputs):
        def f(q, kk):
            if bf16_inputs:
                qq, kb = q.astype(jnp.bfloat16), kk.astype(jnp.bfloat16)
            else:
                qq, kb = q, kk
            q2 = jnp.sum(jnp.square(qq.astype(jnp.float32)), -1,
                         keepdims=True)
            k2 = jnp.sum(jnp.square(kb.astype(jnp.float32)), -1,
                         keepdims=True)
            qk = jnp.einsum("bnd,bmd->bnm", qq, kb,
                            preferred_element_type=jnp.float32)
            d2 = jnp.maximum(q2 - 2.0 * qk + jnp.swapaxes(k2, -1, -2), 0.0)
            d, i = jax.lax.approx_min_k(d2, K, recall_target=rt)
            return jnp.sum(d) + jnp.sum(i.astype(jnp.float32))

        return f

    for b in (1, 16):
        lo_in, hi_in = mk(b, 4, 1), mk(b, 12, 2)
        for rt in (0.90, 0.95):
            for bf16 in (False, True):
                tag = "bf16" if bf16 else "fp32"
                stage(
                    f"raw_{tag}_rt{rt}_b{b}",
                    functools.partial(
                        scan_slope, raw_approx(rt, bf16), lo_in, hi_in),
                )

    # Explicit matmul precision in the wrapper's distance stream (the
    # deciding probe — see module docstring findings).
    def prec_approx(prec, rt):
        def f(q, kk):
            q2 = jnp.sum(jnp.square(q), -1, keepdims=True)
            k2 = jnp.sum(jnp.square(kk), -1, keepdims=True)
            qk = jnp.einsum("bnd,bmd->bnm", q, kk, precision=prec,
                            preferred_element_type=jnp.float32)
            d2 = jnp.maximum(q2 - 2.0 * qk + jnp.swapaxes(k2, -1, -2), 0.0)
            d, i = jax.lax.approx_min_k(d2, K, recall_target=rt)
            return jnp.sum(d) + jnp.sum(i.astype(jnp.float32))

        return f

    for b in (1, 16):
        lo_in, hi_in = mk(b, 4, 1), mk(b, 12, 2)
        for prec in ("default", "high", "highest"):
            stage(
                f"prec_{prec}_rt0.9_b{b}",
                functools.partial(
                    scan_slope, prec_approx(prec, 0.9), lo_in, hi_in),
            )

    # 3-NN interp share (the other half of knn_interp): weights over the
    # full cloud vs the G centers.
    from point_sam_tpu.ops.interp import compute_interp_weights

    def interp_fn(q, kk):
        centers = kk[:, :G]
        idx, w = compute_interp_weights(kk, centers)
        return (jnp.sum(w.astype(jnp.float32)) +
                jnp.sum(idx.astype(jnp.float32)) + jnp.sum(q))

    for b in (1,):
        lo_in, hi_in = mk(b, 4, 1), mk(b, 12, 2)
        stage("interp_b1", functools.partial(
            scan_slope, interp_fn, lo_in, hi_in))

    print(json.dumps(state))


if __name__ == "__main__":
    main()
