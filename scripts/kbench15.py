"""Round-5 perf probe #15: ViT-L roofline attribution (VERDICT r5 #1).

BENCH_r04: vit stage 14.68 ms at B=1, G=2048 — ~57% MFU against the
~1.65 TFLOP forward. Pencil attribution says the gap is roughly:
  fp32->bf16 weight convert per dispatch  ~2.2 ms (1.8 GB HBM)
  attention softmax exp (fp32 [S,S] VPU)  ~2-3 ms
  dh=64 MXU half-utilization in QK/PV     ~1-2 ms
  LN fp32 round trips                     ~1 ms
This probe measures each piece on-chip:

  t_vit_fp32     full 24-block ViT-L fwd, fp32 params (the r4 bench path)
  t_vit_bf16     same with pre-cast bf16 kernels (cast_params_for_inference)
  t_mha          mha_packed_pallas x24 at [1, 2048, 1024] H=16
  t_mha_bq{256,1024,2048}  block_q variants
  t_qkvproj      4x Dense [2048,1024]@[1024,1024] bf16 x24
  t_mlp          SwiGLU fc1_g/fc1_x/silu*mul/subLN/fc2 x24
  t_ln           LayerNorm fp32-stats on [2048, 1024] x24

Resumable: /tmp/kbench15_state.json. Run serialized.
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("KBENCH15_STATE", "/tmp/kbench15_state.json")

S, D, H, HID = 2048, 1024, 16, int(1024 * 4 * 2 / 3)
DEPTH = 24
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

    def slope_time(fn, make_stack, consts=None):
        def run(iters):
            stacks = make_stack(iters)

            @jax.jit
            def many(cs, ss):
                def step(c, x):
                    out = fn(cs, x)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                                   for v in leaves), None
                c, _ = jax.lax.scan(step, jnp.float32(0), ss)
                return c

            cs = consts if consts is not None else ()
            float(many(cs, stacks))
            float(many(cs, stacks))
            return min(_timeit(lambda: float(many(cs, stacks)))
                       for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    def xstack(iters):
        return jnp.asarray(
            rng.standard_normal((iters, 1, S, D)), jnp.float32
        ).astype(jnp.bfloat16)

    # ---- full ViT-L forward, fp32 vs bf16 params
    from point_sam_tpu.models import cast_params_for_inference
    from point_sam_tpu.models.vit import ViT, get_vit_config

    vit = ViT(get_vit_config("eva02_large"), dtype=jnp.bfloat16, remat=False)
    params = jax.jit(
        lambda: vit.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, D), jnp.bfloat16))
    )()

    stage("t_vit_fp32", lambda: slope_time(
        lambda cs, x: vit.apply(cs, x), xstack, consts=params))
    bparams = cast_params_for_inference(params)
    stage("t_vit_bf16", lambda: slope_time(
        lambda cs, x: vit.apply(cs, x), xstack, consts=bparams))

    # ---- attention kernel alone, x DEPTH
    from point_sam_tpu.ops.attention import mha_packed_pallas

    def mha_n(bq):
        def f(cs, x):
            def body(c, _):
                c = mha_packed_pallas(c, c, c, H, block_q=bq)
                return c, None
            y, _ = jax.lax.scan(body, x, None, length=DEPTH)
            return y
        return f

    for bq in (256, 512, 1024, 2048):
        stage(f"t_mha_bq{bq}", lambda bq=bq: slope_time(mha_n(bq), xstack))

    # ---- projection matmuls x DEPTH (q,k,v,proj = 4 per block)
    wq = jnp.asarray(rng.standard_normal((4, D, D)) / 32, jnp.bfloat16)

    def qkvproj(cs, x):
        def body(c, _):
            for i in range(4):
                c = jnp.dot(c, cs[i], preferred_element_type=jnp.bfloat16)
            return c, None
        y, _ = jax.lax.scan(body, x, None, length=DEPTH)
        return y

    stage("t_qkvproj", lambda: slope_time(qkvproj, xstack, consts=wq))

    # ---- SwiGLU MLP x DEPTH (with sub-LN, fp32 stats)
    w1g = jnp.asarray(rng.standard_normal((D, HID)) / 32, jnp.bfloat16)
    w1x = jnp.asarray(rng.standard_normal((D, HID)) / 32, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HID, D)) / 32, jnp.bfloat16)

    def _ln(x32):
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        d = x32 - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        return d * jax.lax.rsqrt(var + 1e-5)

    def mlp(cs, x):
        a, b, c2 = cs

        def body(c, _):
            g = jnp.dot(c, a, preferred_element_type=jnp.bfloat16)
            h = jnp.dot(c, b, preferred_element_type=jnp.bfloat16)
            u = jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * h
            u = _ln(u.astype(jnp.float32)).astype(jnp.bfloat16)
            c = jnp.dot(u, c2, preferred_element_type=jnp.bfloat16)
            return c, None

        y, _ = jax.lax.scan(body, x, None, length=DEPTH)
        return y

    stage("t_mlp", lambda: slope_time(mlp, xstack, consts=(w1g, w1x, w2)))

    # ---- LayerNorm x DEPTH
    def ln_n(cs, x):
        def body(c, _):
            return _ln(c.astype(jnp.float32)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=DEPTH)
        return y

    stage("t_ln", lambda: slope_time(ln_n, xstack))


if __name__ == "__main__":
    main()
