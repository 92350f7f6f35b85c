"""Round-3 perf probes #5: fused PointNet kernel forward variants.

The fused patch-encoder forward (ops/patch_encoder_pallas.py) runs the
B=1 eval config (G=2048, K=256, C_in=6, 128/512 hidden, 1024 out) at
~8.5 ms against a ~3.8 ms pure-matmul floor (pe_b1, kbench4). Suspected
slop: VPU work (fp32 LN stats + erf polynomial on [rows, 512]) serialized
with the MXU chain inside each grid cell, plus fp32 param streaming.

Variants (all value-only op changes at shapes the production kernel
already compiles — no new Mosaic patterns, low SIGABRT risk):

  base            production kernel as-is
  rows2048/8192   tile-size sweep around the 4096 default
  bf16_apply      LN stats in fp32 (parity convention) but scale+bias+GELU
                  applied in bf16 — halves the widest VPU region
  params_bf16     params pre-cast to bf16 on the host (halves param
                  streaming; numerics: weights already round-trip through
                  bf16 inside the kernel, so matmul inputs are identical;
                  LN scale/bias lose fp32 apply — measured separately)
  tanh_gelu       tanh-approx GELU instead of the erf polynomial
                  (NOT parity-safe — measurement only, to bound how much
                  of the gap is the erf polynomial)

Each variant timed by the scan-slope method (two scan lengths over
distinct inputs; slope removes the tunnel dispatch floor). Resumable:
/tmp/kbench5_state.json.
"""

from __future__ import annotations

import functools
import json
import os
import time

STATE_PATH = os.environ.get("KBENCH5_STATE", "/tmp/kbench5_state.json")

G, K, C_IN, H0, H1, C_OUT = 2048, 256, 6, 128, 512, 1024
ITERS_A, ITERS_B = 4, 12


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from point_sam_tpu.ops import patch_encoder_pallas as pe

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
        print(f"# {key}: {state[key]*1e3:.3f} ms", flush=True)
        return state[key]

    rng = np.random.default_rng(0)
    params32 = (
        rng.standard_normal((C_IN, H0)).astype(np.float32) * 0.2,
        rng.standard_normal(H0).astype(np.float32) * 0.02,
        np.ones(H0, np.float32), np.zeros(H0, np.float32),
        rng.standard_normal((H0, H0)).astype(np.float32) * 0.1,
        rng.standard_normal(H0).astype(np.float32) * 0.02,
        rng.standard_normal((2 * H0, H1)).astype(np.float32) * 0.07,
        rng.standard_normal(H1).astype(np.float32) * 0.02,
        np.ones(H1, np.float32), np.zeros(H1, np.float32),
        rng.standard_normal((H1, C_OUT)).astype(np.float32) * 0.05,
        rng.standard_normal(C_OUT).astype(np.float32) * 0.02,
    )
    params = tuple(jnp.asarray(p) for p in params32)

    n_inputs = 3
    xs = jnp.asarray(
        rng.standard_normal((n_inputs, 1, G * K, C_IN)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def timed_scan(callable_one):
        """ms per call via the slope between two scan lengths."""

        def run_scan(length):
            @jax.jit
            def scan(xs):
                def step(c, i):
                    y = callable_one(xs[i % n_inputs])
                    return c + jnp.sum(y.astype(jnp.float32)), None

                c, _ = jax.lax.scan(
                    step, jnp.float32(0), jnp.arange(length))
                return c

            float(scan(xs))  # compile+warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(scan(xs))
                best = min(best, time.perf_counter() - t0)
            return best

        ta, tb = run_scan(ITERS_A), run_scan(ITERS_B)
        return max((tb - ta) / (ITERS_B - ITERS_A), 1e-9)

    # ---------------- base + tile sweep (production kernel)
    for rt, name in ((4096, "base"), (2048, "rows2048"), (8192, "rows8192")):
        stage(name, lambda rt=rt: timed_scan(
            lambda x: pe.patch_encoder_fused(
                x, params, num_groups=G, group_size=K, rows_target=rt)))

    # ---------------- variant kernels -------------------------------------
    def make_variant(ln_apply_bf16=False, tanh_gelu=False):
        cdt = jnp.bfloat16

        def ln_gelu(x, s_ref, b_ref):
            x32 = x.astype(jnp.float32)
            m = jnp.mean(x32, axis=-1, keepdims=True)
            c = x32 - m
            v = jnp.mean(c * c, axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(v + 1e-5)
            if ln_apply_bf16:
                y = ((c * inv).astype(cdt) * s_ref[...].astype(cdt)
                     + b_ref[...].astype(cdt))
            else:
                y = (c * inv) * s_ref[...].astype(jnp.float32) \
                    + b_ref[...].astype(jnp.float32)
            if tanh_gelu:
                out = jax.nn.gelu(y.astype(cdt), approximate=True)
                return out
            y32 = y.astype(jnp.float32)
            out = y32 * 0.5 * (1.0 + pe.erf_f32(y32 * pe._SQRT_HALF))
            return out.astype(cdt)

        def kernel(x_ref, w1a, b1a, s1, t1, w1b, b1b,
                   w2a, b2a, s2, t2, w2b, b2b, o_ref, *, tg, k):
            x = x_ref[0]
            h = pe._dense(x, w1a, b1a, cdt)
            h = ln_gelu(h, s1, t1)
            h = pe._dense(h, w1b, b1b, cdt)
            h0 = h.shape[-1]
            pooled = jnp.max(h.reshape(tg, k, h0), axis=1)
            w2 = w2a[...]
            mm = (((1,), (0,)), ((), ()))
            up_pool = jax.lax.dot_general(
                pooled.astype(cdt), w2[:h0].astype(cdt), mm,
                preferred_element_type=jnp.float32)
            up_pt = jax.lax.dot_general(
                h.astype(cdt), w2[h0:].astype(cdt), mm,
                preferred_element_type=jnp.float32)
            h1 = up_pt.shape[-1]
            h = ((up_pt.reshape(tg, k, h1) + up_pool[:, None, :])
                 .reshape(tg * k, h1)).astype(cdt) + b2a[...].astype(cdt)
            h = ln_gelu(h, s2, t2)
            h = pe._dense(h, w2b, b2b, cdt)
            co = h.shape[-1]
            o_ref[0] = jnp.max(h.reshape(tg, k, co), axis=1).astype(
                o_ref.dtype)

        @functools.partial(jax.jit, static_argnames=())
        def call(x, ps):
            tg = pe._pick_tile(G, K, 4096)
            rows = tg * K
            vecs = tuple(p.reshape(1, -1) if p.ndim == 1 else p for p in ps)
            full = lambda p: pl.BlockSpec(p.shape, lambda b, g: (0, 0))
            return pl.pallas_call(
                functools.partial(kernel, tg=tg, k=K),
                grid=(1, G // tg),
                in_specs=[
                    pl.BlockSpec((1, rows, C_IN), lambda b, g: (b, g, 0)),
                    *[full(p) for p in vecs],
                ],
                out_specs=pl.BlockSpec((1, tg, C_OUT), lambda b, g: (b, g, 0)),
                out_shape=jax.ShapeDtypeStruct((1, G, C_OUT), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=96 * 2**20,
                ),
            )(x, *vecs)

        return call

    stage("bf16_apply", lambda: timed_scan(
        lambda x: make_variant(ln_apply_bf16=True)(x, params)))
    stage("tanh_gelu", lambda: timed_scan(
        lambda x: make_variant(ln_apply_bf16=True, tanh_gelu=True)(
            x, params)))

    params_bf16 = tuple(p.astype(jnp.bfloat16) for p in params)
    stage("params_bf16", lambda: timed_scan(
        lambda x: pe.patch_encoder_fused(
            x, params_bf16, num_groups=G, group_size=K)))

    print(json.dumps({k: round(v * 1e3, 3) for k, v in state.items()}))


if __name__ == "__main__":
    main()
