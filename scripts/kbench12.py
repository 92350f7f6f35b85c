"""Round-5 perf probe #12: fix the gathered-query kNN layout pessimization.

kbench11 + HLO diff: when the kNN query is a *gather* (FPS centers) rather
than a slice, XLA fuses the gather into the [G, N] distance fusion and
assigns ROW-major {1,0} layouts to both [*,3] dot operands; the slice case
relayouts both to column-major {0,1:T(4,128)} first. Cost: +1.8 ms
(4.17 vs 2.36 ms) at B=1 N=100k G=2048 K=256. Variants:

  t_base      gather + knn as today                          (expect ~4.2)
  t_trans     explicit transposed-operand einsum ("...dn,...dm->...nm")
              with barriered [*, D] -> [D, *] transposes
  t_bar2      optimization_barrier on BOTH query and key before knn
  t_pad8      zero-pad D 3 -> 8 on both operands (distance-invariant)
  t_cat       compute distances from concat([centers, p]) sliced — make the
              query a SLICE again: keys = concat(centers, p) with the first
              G rows the centers; query = keys[:, :G]; neighbor indices
              then need -G correction and the first G keys masked... here we
              just measure the distance+approx cost shape (index fixup is
              a cheap elementwise add; padded-key masking via key_valid).

Resumable: /tmp/kbench12_state.json. Run serialized (single-core host).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH12_STATE", "/tmp/kbench12_state.json")

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

    from point_sam_tpu.ops import batch_index_select, knn

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
        idx = np.stack([
            rng.choice(N, size=(1, G), replace=False).astype(np.int32)
            for _ in range(iters)])
        return jnp.asarray(pts), jnp.asarray(idx)

    kw = dict(method="approx", recall_target=0.9)

    def base(x):
        p, fps_idx = x
        c = batch_index_select(p, fps_idx, axis=1)
        return knn(c, p, K, **kw)[1]

    stage("t_base", lambda: slope_time(base, istack))

    def approx_from_d2(d2):
        d, i = jax.lax.approx_min_k(d2, K, recall_target=0.9)
        return i.astype(jnp.int32)

    def trans(x):
        p, fps_idx = x
        c = batch_index_select(p, fps_idx, axis=1)
        qt = jax.lax.optimization_barrier(jnp.swapaxes(c, -1, -2))
        kt = jax.lax.optimization_barrier(jnp.swapaxes(p, -1, -2))
        q2 = jnp.sum(jnp.square(qt), axis=-2)  # [1, G]
        k2 = jnp.sum(jnp.square(kt), axis=-2)  # [1, N]
        qk = jnp.einsum("...dn,...dm->...nm", qt, kt, precision="high",
                        preferred_element_type=jnp.float32)
        d2 = q2[..., :, None] - 2.0 * qk + k2[..., None, :]
        return approx_from_d2(jnp.maximum(d2, 0.0))

    stage("t_trans", lambda: slope_time(trans, istack))

    def bar2(x):
        p, fps_idx = x
        c = batch_index_select(p, fps_idx, axis=1)
        c, pk = jax.lax.optimization_barrier((c, p))
        return knn(c, pk, K, **kw)[1]

    stage("t_bar2", lambda: slope_time(bar2, istack))

    def pad8(x):
        p, fps_idx = x
        c = batch_index_select(p, fps_idx, axis=1)
        pad = [(0, 0), (0, 0), (0, 5)]
        return knn(jnp.pad(c, pad), jnp.pad(p, pad), K, **kw)[1]

    stage("t_pad8", lambda: slope_time(pad8, istack))

    def cat(x):
        p, fps_idx = x
        c = batch_index_select(p, fps_idx, axis=1)
        keys = jnp.concatenate([c, p], axis=1)  # [1, G+N, 3]
        q = keys[:, :G]
        valid = jnp.arange(G + N) >= G  # mask the duplicated center rows
        valid = jnp.broadcast_to(valid, keys.shape[:-1])
        d, i = knn(q, keys, K, key_valid=valid, **kw)
        return (i - G).astype(jnp.int32)

    stage("t_cat", lambda: slope_time(cat, istack))


if __name__ == "__main__":
    main()
