"""Round-3 perf probes #3: binned kNN kernel timing/recall + interp split.

Stages (flagship shape G=2048, N=100k, K=256):
  binned_r90_m95 / m99   full knn_binned_pallas (kernel + approx merge)
  recall_*               composite set-recall vs exact, + stock approx recall
  interp_d0/k1/k3        interp kernel variants (dist-only / 1 / 3 extracts)
  interp_t1024/t2048     bigger query tiles with raised VMEM limit
"""

from __future__ import annotations

import functools
import json
import os
import time

STATE_PATH = os.environ.get("KBENCH3_STATE", "/tmp/kbench3_state.json")


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from point_sam_tpu.ops.knn import knn
    from point_sam_tpu.ops.knn_pallas import knn_binned_pallas

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
        rng.standard_normal((ITERS, 1, N, 3)).astype(np.float32) / 3.0)
    centers = jnp.asarray(
        rng.standard_normal((ITERS, 1, G, 3)).astype(np.float32) / 3.0)

    def timed_scan(fn, *stacks):
        @jax.jit
        def many(*ss):
            def step(c, xs):
                out = fn(*xs)
                leaves = jax.tree_util.tree_leaves(out)
                return (c + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                                for x in leaves), None)
            c, _ = jax.lax.scan(step, jnp.float32(0), ss)
            return c
        float(many(*stacks))
        float(many(*stacks))
        best = min(_timeit(lambda: float(many(*stacks))) for _ in range(REPS))
        return best / stacks[0].shape[0]

    stage("binned_r90_m95", lambda: timed_scan(
        lambda q, kk: knn_binned_pallas(q, kk, K, recall_target=0.9,
                                        merge_recall=0.95),
        centers, coords))
    stage("binned_r90_m99", lambda: timed_scan(
        lambda q, kk: knn_binned_pallas(q, kk, K, recall_target=0.9,
                                        merge_recall=0.99),
        centers, coords))

    # ---------------- composite recall vs exact (one cloud)
    def recall_of(idx, ie):
        idx = np.asarray(idx)[0]
        ie = np.asarray(ie)[0]
        return float(np.mean([
            len(set(idx[g].tolist()) & set(ie[g].tolist())) / K
            for g in range(G)
        ]))

    def measure_recalls():
        q1, c1 = centers[0], coords[0]
        _, ie = knn(q1, c1, K, method="exact")
        out = {}
        for mr in (0.95, 0.99):
            _, ib = knn_binned_pallas(q1, c1, K, recall_target=0.9,
                                      merge_recall=mr)
            out[f"binned_m{int(mr*100)}"] = recall_of(ib, ie)
        _, ia = knn(q1, c1, K, method="approx", recall_target=0.9)
        out["stock_r90"] = recall_of(ia, ie)
        return out

    stage("recalls", measure_recalls)

    # ---------------- interp variants
    from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

    stage("interp_cur", lambda: timed_scan(
        lambda q, kk: interp_weights_pallas(q, kk), coords, centers))

    def variant_kernel(q_ref, k_ref, o_ref, *, n_extract: int):
        q = q_ref[0]
        k = k_ref[0]
        d2 = sum((q[:, i:i + 1] - k[:, i:i + 1].T) ** 2 for i in range(3))
        if n_extract == 0:
            o_ref[0] = jnp.min(d2, axis=-1, keepdims=True)
            return
        iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        acc = jnp.zeros((d2.shape[0], 1), jnp.float32)
        for _ in range(n_extract):
            m = jnp.min(d2, axis=-1, keepdims=True)
            i = jnp.min(jnp.where(d2 == m, iota, jnp.int32(2 ** 30)),
                        axis=-1, keepdims=True)
            acc = acc + m + i.astype(jnp.float32)
            d2 = jnp.where(iota == i, jnp.inf, d2)
        o_ref[0] = acc

    def run_variant(q, kk, n_extract, tile_q=512, vmem=None):
        B, n, _ = q.shape
        g = kk.shape[1]
        n_pad = -(-n // tile_q) * tile_q
        if n_pad != n:
            q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        kwargs = {}
        if vmem:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem)
        out = pl.pallas_call(
            functools.partial(variant_kernel, n_extract=n_extract),
            grid=(B, n_pad // tile_q),
            in_specs=[
                pl.BlockSpec((1, tile_q, 3), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, g, 3), lambda b, i: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tile_q, 1), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, 1), jnp.float32),
            **kwargs,
        )(q.astype(jnp.float32), kk.astype(jnp.float32))
        return out[:, :n]

    stage("interp_d0", lambda: timed_scan(
        lambda q, kk: run_variant(q, kk, 0), coords, centers))
    stage("interp_k1", lambda: timed_scan(
        lambda q, kk: run_variant(q, kk, 1), coords, centers))
    stage("interp_k3", lambda: timed_scan(
        lambda q, kk: run_variant(q, kk, 3), coords, centers))
    stage("interp_k3_t1024", lambda: timed_scan(
        lambda q, kk: run_variant(q, kk, 3, tile_q=1024, vmem=96 * 2**20),
        coords, centers))
    stage("interp_k3_t2048", lambda: timed_scan(
        lambda q, kk: run_variant(q, kk, 3, tile_q=2048, vmem=110 * 2**20),
        coords, centers))

    print(json.dumps(state))


if __name__ == "__main__":
    main()
