"""Decode-path decomposition at the eval shape (round-4 perf work).

BENCH_r04 recorded decode at 20.9 ms per 8-prompt batch once the masks
were actually consumed (the upscale had been dead-code-eliminated before).
This probe splits that into:

  decode_full      model.decode, fused Pallas upscale tail (default path)
  decode_xla       model.decode with the fused tail gated OFF (r3 path +
                   the Dense_0 hoist)
  interp_repeated  the 3-NN gather+weighted-sum alone  [8 x 100k x 256]
  upscale_fused    upscale_hyper_fused kernel alone
  upscale_ref      the XLA reference chain alone (LN-GELU-Dense-GELU-dot)

Methodology: bench.py's scan-amortization over ITERS distinct inputs,
minus the measured tunnel dispatch floor. Resumable state file
(/tmp/kbench7_state.json); stages are keyed by a shape tag so editing
shapes invalidates stale numbers (ADVICE r3).
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH7_STATE", "/tmp/kbench7_state.json")


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

    from point_sam_tpu.models import (
        PointCloudSAM,
        PointSAMConfig,
        TokenizerConfig,
        init_variables,
    )

    N, G, K, M, D, ITERS, REPS = 100_000, 2048, 256, 8, 256, 12, 3
    shape_tag = f"N{N}-G{G}-M{M}-D{D}-I{ITERS}"

    try:
        with open(STATE_PATH) as f:
            state = json.load(f)
    except Exception:
        state = {}
    if state.get("_shape") != shape_tag:
        state = {"_shape": shape_tag}

    def stage(key, fn):
        if key not in state:
            state[key] = fn()
            with open(STATE_PATH, "w") as f:
                json.dump(state, f)
        print(f"# {key}: {state[key] * 1e3:.2f} ms", flush=True)
        return state[key]

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    tok = TokenizerConfig(num_patches=G, patch_size=K)
    cfg = PointSAMConfig(vit="eva02_large", tokenizer=tok, prompt_iters=5,
                         vit_remat=False)
    model = PointCloudSAM(cfg, dtype=cdt)
    variables = init_variables(model, jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    # dispatch floor
    trivial = jax.jit(lambda x: jnp.sum(x * 2.0))
    xtiny = jnp.ones((128, 128), jnp.float32)
    float(trivial(xtiny))
    floor = stage(
        "floor",
        lambda: min(_timeit(lambda: float(trivial(xtiny))) for _ in range(8)),
    )

    def timed_scan(fn, *stacks, consts=()):
        @jax.jit
        def many(consts, *ss):
            def step(c, xs):
                out = fn(consts, *xs)
                leaves = jax.tree_util.tree_leaves(out)
                return (
                    c + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                            for x in leaves),
                    None,
                )

            c, _ = jax.lax.scan(step, jnp.float32(0), ss)
            return c

        float(many(consts, *stacks))
        float(many(consts, *stacks))
        best = min(
            _timeit(lambda: float(many(consts, *stacks))) for _ in range(REPS)
        )
        return max(best - floor, 1e-9) / stacks[0].shape[0]

    # ------------------------------------------------ encode once (cached)
    coords = jnp.asarray(rng.standard_normal((1, N, 3)).astype(np.float32) / 3)
    feats = jnp.asarray(rng.random((1, N, 3)).astype(np.float32))
    geom = jax.jit(lambda c: model.make_geometry(c))(coords)
    emb, pe = jax.jit(
        lambda v, c, f, g: model.apply(v, c, f, g, method=model.encode)
    )(variables, coords, feats, geom)
    jax.block_until_ready(emb)

    pc_stack = jnp.asarray(
        rng.standard_normal((ITERS, M, 1, 3)).astype(np.float32) / 3.0)
    pl_ = jnp.ones((M, 1), bool)

    def run_decode(v, pc):
        return model.apply(
            v, emb, pe, coords, geom, pc, pl_, None,
            prompt_valid=jnp.ones((M, 1), bool), multimask_output=True,
            method=model.decode,
        )

    stage("decode_full", lambda: timed_scan(run_decode, pc_stack,
                                            consts=variables))

    # Fused tail gated OFF (trace-time monkeypatch): the XLA chain + hoist.
    def measure_xla():
        from point_sam_tpu.ops import upscale_pallas as up

        orig = up.upscale_dispatch_ok, up.interp_upscale_dispatch_ok
        up.upscale_dispatch_ok = lambda *a, **k: False
        up.interp_upscale_dispatch_ok = lambda *a, **k: False
        try:
            return timed_scan(run_decode, pc_stack, consts=variables)
        finally:
            up.upscale_dispatch_ok, up.interp_upscale_dispatch_ok = orig

    stage("decode_xla", measure_xla)

    # ------------------------------------------------ isolated tail pieces
    from point_sam_tpu.ops import interpolate_features_repeated
    from point_sam_tpu.ops.upscale_pallas import (
        upscale_hyper_fused,
        upscale_hyper_reference,
    )

    # Tail probes use a shorter stack: [ITERS, M, N, D] bf16 at ITERS=12
    # would be ~5 GB of HBM just for inputs.
    IT = 4
    src_stack = jnp.asarray(
        rng.standard_normal((IT, M, G, D)).astype(np.float32)).astype(cdt)
    x_stack = jnp.asarray(
        rng.standard_normal((IT, M, N, D)).astype(np.float32)).astype(cdt)
    hyper_stack = jnp.asarray(
        rng.standard_normal((IT, M, 3, D)).astype(np.float32)).astype(cdt)
    ups = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (rng.standard_normal(D) * 0.2 + 1.0,
                  rng.standard_normal(D) * 0.1,
                  rng.standard_normal((D, D)) / np.sqrt(D),
                  rng.standard_normal(D) * 0.1)
    )

    stage("interp_repeated", lambda: timed_scan(
        lambda c, s: interpolate_features_repeated(
            s, geom["interp_index"], geom["interp_weight"]),
        src_stack))
    stage("upscale_fused", lambda: timed_scan(
        lambda c, x, h: upscale_hyper_fused(x, ups, h, cdt=cdt),
        x_stack, hyper_stack))
    stage("upscale_ref", lambda: timed_scan(
        lambda c, x, h: upscale_hyper_reference(x, ups, h, cdt=cdt),
        x_stack, hyper_stack))

    from point_sam_tpu.ops.upscale_pallas import interp_upscale_hyper_fused

    stage("interp_upscale_fused", lambda: timed_scan(
        lambda c, s, h: interp_upscale_hyper_fused(
            s, geom["interp_index"], geom["interp_weight"], ups, h, cdt=cdt),
        src_stack, hyper_stack))

    print(json.dumps({k: (round(v * 1e3, 3) if isinstance(v, float) else v)
                      for k, v in state.items()}))


if __name__ == "__main__":
    main()
