"""Round-5 perf probes #8: ViT roofline attribution + geometry split.

VERDICT r4 #1: the ViT-L forward (G=2048 tokens) measures 14.68 ms ~ 57%
MFU; nobody has audited where the missing 43% goes. VERDICT r4 #2: the
knn_interp stage (6.80 ms) is two separate distance sweeps and the
group_pointnet stage (6.28 ms) is suspected VPU-bound. This script
attributes both on the real chip.

ViT probes (B=1, L=2048, D=1024, H=16, ViT-L geometry, bf16):
  v_full         the production ViT module (scan_blocks, remat=False)
  v_epilogue     patch_proj + pos_embed + out_proj (what the bench lumps
                 into the "vit" stage besides the blocks)
  v_mm           carry-chained 24x the per-block matmul set (qkv separate,
                 proj, fc1_g, fc1_x, fc2) — the MXU floor for the matmuls
  v_mm_merged    same FLOPs with qkv as ONE [D,3D] and fc1 as ONE [D,2H]
  v_ln           carry-chained 24x the 3 per-block LayerNorms (fp32 stats)
  v_attn         carry-chained 24x mha_flat (production packed kernel)
  v_attn_bqXXX   block_q sweep for the packed kernel
  v_attn_postdiv variant kernel: normalize AFTER the PV matmul (kills the
                 [L, L] divide)
  v_attn_bf16exp variant kernel: postdiv + exp computed in bf16
  v_softmax      carry-chained 24x softmax-only on [16, 2048, 2048] fp32
                 (bounds the VPU cost of the softmax inside attention)

Geometry probes (B=1, N=100k, G=2048, K=256):
  g_knn          approx kNN alone (rt=0.9, precision high)
  g_interp       interp_weights_pallas alone
  g_interp_tq    tile_q sweep for the interp kernel
  g_gather       group_points alone (the [B,G,K,6] XLA gather)
  g_pointnet     patch_encoder_fused alone on pre-gathered input

Timing: scan-slope between ITERS_A and ITERS_B iterations over distinct
inputs (removes the tunnel dispatch floor exactly). Resumable:
/tmp/kbench8_state.json. Run serialized (single-core host, CLAUDE.md).
"""

from __future__ import annotations

import functools
import json
import os
import time

STATE_PATH = os.environ.get("KBENCH8_STATE", "/tmp/kbench8_state.json")

B, L, D, H = 1, 2048, 1024, 16
HID = int(D * 4 * 2 / 3)  # 2730 (SwiGLU hidden, EVA02-L)
DEPTH = 24
N, G, K = 100_000, 2048, 256
ITERS_A, ITERS_B = 4, 12


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
            t0 = time.perf_counter()
            try:
                state[key] = fn()
            except Exception as exc:  # record the failure, keep going
                state[key] = None
                print(f"# {key}: FAILED {type(exc).__name__}: {exc}"[:300],
                      flush=True)
            with open(STATE_PATH, "w") as f:
                json.dump(state, f)
        if state[key] is not None:
            print(f"# {key}: {state[key]*1e3:.3f} ms", flush=True)
        return state[key]

    rng = np.random.default_rng(0)

    def slope_time(make_fn, make_stack):
        """Seconds/iter via the scan-slope method: fit wall(iters) at two
        scan lengths; the slope is pure per-iteration device time."""

        def run(iters):
            stacks = make_stack(iters)
            fn = make_fn()

            @jax.jit
            def many(*ss):
                def step(c, xs):
                    out = fn(*xs)
                    leaves = jax.tree_util.tree_leaves(out)
                    return c + sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                                   for x in leaves), None
                c, _ = jax.lax.scan(step, jnp.float32(0), ss)
                return c

            float(many(*stacks))  # compile
            float(many(*stacks))  # warm
            return min(_timeit(lambda: float(many(*stacks))) for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    bf16 = jnp.bfloat16

    # ================================================== ViT-side probes
    def xstack(iters, *shape, dtype=bf16):
        return (jnp.asarray(
            rng.standard_normal((iters, *shape)).astype(np.float32) * 0.02
        ).astype(dtype),)

    # ---- v_full: the production ViT block stack
    def v_full():
        from point_sam_tpu.models.vit import ViT, get_vit_config

        vit = ViT(get_vit_config("eva02_large"), dtype=bf16, remat=False)
        vars_ = jax.jit(vit.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 256, D), bf16))
        jax.block_until_ready(vars_)

        def make_fn():
            return lambda v, x: vit.apply(v, x)

        def run(iters):
            xs = xstack(iters, B, L, D)

            @jax.jit
            def many(v, s):
                def step(c, x):
                    return c + jnp.sum(jnp.abs(vit.apply(v, x)).astype(jnp.float32)), None
                c, _ = jax.lax.scan(step, jnp.float32(0), s)
                return c

            float(many(vars_, *xs))
            float(many(vars_, *xs))
            return min(_timeit(lambda: float(many(vars_, *xs))) for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    stage("v_full", v_full)

    # ---- v_mm: matmul floor (weights shared across layers; carry-chained)
    w = {
        "q": jnp.asarray(rng.standard_normal((D, D)) * 0.02, bf16),
        "k": jnp.asarray(rng.standard_normal((D, D)) * 0.02, bf16),
        "v": jnp.asarray(rng.standard_normal((D, D)) * 0.02, bf16),
        "qkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, bf16),
        "proj": jnp.asarray(rng.standard_normal((D, D)) * 0.02, bf16),
        "g": jnp.asarray(rng.standard_normal((D, HID)) * 0.02, bf16),
        "x": jnp.asarray(rng.standard_normal((D, HID)) * 0.02, bf16),
        "gx": jnp.asarray(rng.standard_normal((D, 2 * HID)) * 0.02, bf16),
        "fc2": jnp.asarray(rng.standard_normal((HID, D)) * 0.02, bf16),
    }

    def chain_probe(step_fn):
        def probe():
            def run(iters):
                xs = xstack(iters, B, L, D)

                @jax.jit
                def many(w, s):
                    def outer(c, x):
                        def layer(h, _):
                            return step_fn(w, h), None
                        h, _ = jax.lax.scan(layer, x, None, length=DEPTH)
                        return c + jnp.sum(jnp.abs(h).astype(jnp.float32)), None
                    c, _ = jax.lax.scan(outer, jnp.float32(0), s)
                    return c

                float(many(w, *xs))
                float(many(w, *xs))
                return min(_timeit(lambda: float(many(w, *xs))) for _ in range(3))

            ta, tb = run(ITERS_A), run(ITERS_B)
            return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

        return probe

    def mm_sep(w, h):
        q = h @ w["q"]; k = h @ w["k"]; v = h @ w["v"]
        a = q + k + v  # stand-in for attention output (cheap)
        o = a @ w["proj"]
        g = o @ w["g"]; x2 = o @ w["x"]
        m = (g * x2) @ w["fc2"]
        return (h + m * 1e-3).astype(h.dtype)

    def mm_merged(w, h):
        qkv = h @ w["qkv"]
        a = qkv[..., :D] + qkv[..., D:2 * D] + qkv[..., 2 * D:]
        o = a @ w["proj"]
        gx = o @ w["gx"]
        m = (gx[..., :HID] * gx[..., HID:]) @ w["fc2"]
        return (h + m * 1e-3).astype(h.dtype)

    stage("v_mm", chain_probe(mm_sep))
    stage("v_mm_merged", chain_probe(mm_merged))

    # ---- v_ln: 3 LayerNorms per block
    from point_sam_tpu.models.layers import LayerNorm  # noqa: F401

    def ln_f(x):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=-1, keepdims=True)
        c = x32 - m
        v_ = jnp.mean(c * c, axis=-1, keepdims=True)
        return (c * jax.lax.rsqrt(v_ + 1e-5)).astype(x.dtype)

    def ln3(w, h):
        return (ln_f(ln_f(ln_f(h)) + 1e-3) + h * 1e-3).astype(h.dtype)

    stage("v_ln", chain_probe(ln3))

    # ---- attention probes
    from point_sam_tpu.ops.attention import mha_packed_pallas

    def attn_probe(block_q):
        def f(w, h):
            return (h + mha_packed_pallas(h, h, h, H, block_q=block_q)
                    * 1e-3).astype(h.dtype)
        return chain_probe(f)

    stage("v_attn_bq512", attn_probe(512))
    stage("v_attn_bq1024", attn_probe(1024))
    # bq=2048 (whole-S logits in VMEM) fails the remote compile helper at
    # the default scoped-VMEM budget — not retried (repeated Mosaic crashes
    # can wedge the TPU tunnel, CLAUDE.md).

    # ---- variant kernels: post-PV normalization (+ bf16 exp)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _packed_kernel_var(q_ref, k_ref, v_ref, o_ref, *, scale, dh, hpb,
                           bf16_exp):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        outs = []
        for j in range(hpb):
            sl = slice(j * dh, (j + 1) * dh)
            qj, kj, vj = q[:, sl], k[:, sl], v[:, sl]
            logits = jax.lax.dot_general(
                qj, kj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            if bf16_exp:
                e = e.astype(jnp.bfloat16)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(o / denom)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    def mha_var(q, k, v, num_heads, *, block_q=512, bf16_exp=False):
        Bq, S, Dq = q.shape
        dh = Dq // num_heads
        scale = 1.0 / float(dh) ** 0.5
        hpb = 128 // dh
        bq = min(block_q, S)
        grid = (Bq, num_heads // hpb, S // bq)
        lanes = hpb * dh
        return pl.pallas_call(
            functools.partial(_packed_kernel_var, scale=scale, dh=dh,
                              hpb=hpb, bf16_exp=bf16_exp),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
                pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v)

    def attn_var_probe(**kw):
        def f(w, h):
            return (h + mha_var(h, h, h, H, **kw) * 1e-3).astype(h.dtype)
        return chain_probe(f)

    stage("v_attn_postdiv", attn_var_probe(block_q=512))
    stage("v_attn_bf16exp", attn_var_probe(block_q=512, bf16_exp=True))
    stage("v_attn_bf16exp_bq1024", attn_var_probe(block_q=1024, bf16_exp=True))

    # ---- interleaved scheduling variant: expose head-level parallelism to
    # the Mosaic scheduler (QK for both heads, then both softmaxes, then
    # both PVs) so VPU softmax can overlap the other head's MXU matmuls.
    def _packed_kernel_il(q_ref, k_ref, v_ref, o_ref, *, scale, dh, hpb):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        sls = [slice(j * dh, (j + 1) * dh) for j in range(hpb)]
        lg = [
            jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            for sl in sls
        ]
        es = []
        for l in lg:
            m = jnp.max(l, axis=-1, keepdims=True)
            es.append(jnp.exp(l - m))
        outs = []
        for e, sl in zip(es, sls):
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(o / denom)
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    def mha_il(q, k, v, num_heads, *, block_q=512):
        Bq, S, Dq = q.shape
        dh = Dq // num_heads
        scale = 1.0 / float(dh) ** 0.5
        hpb = 128 // dh
        bq = min(block_q, S)
        lanes = hpb * dh
        return pl.pallas_call(
            functools.partial(_packed_kernel_il, scale=scale, dh=dh, hpb=hpb),
            grid=(Bq, num_heads // hpb, S // bq),
            in_specs=[
                pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
                pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v)

    def attn_il_probe(block_q):
        def f(w, h):
            return (h + mha_il(h, h, h, H, block_q=block_q) * 1e-3).astype(h.dtype)
        return chain_probe(f)

    stage("v_attn_il_bq512", attn_il_probe(512))
    stage("v_attn_il_bq1024", attn_il_probe(1024))

    # ---- v_epilogue
    def v_epilogue():
        wp = jnp.asarray(rng.standard_normal((512, D)) * 0.02, bf16)
        w1 = jnp.asarray(rng.standard_normal((3, 128)) * 0.02, bf16)
        w2 = jnp.asarray(rng.standard_normal((128, D)) * 0.02, bf16)
        wo = jnp.asarray(rng.standard_normal((D, 256)) * 0.02, bf16)

        def fn(pe, centers):
            x = pe @ wp + jax.nn.gelu(centers @ w1) @ w2
            return x @ wo

        def run(iters):
            pes = xstack(iters, B, L, 512)[0]
            cs = xstack(iters, B, L, 3)[0]

            @jax.jit
            def many(pes, cs):
                def step(c, xs):
                    return c + jnp.sum(jnp.abs(fn(*xs)).astype(jnp.float32)), None
                c, _ = jax.lax.scan(step, jnp.float32(0), (pes, cs))
                return c

            float(many(pes, cs)); float(many(pes, cs))
            return min(_timeit(lambda: float(many(pes, cs))) for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    stage("v_epilogue", v_epilogue)

    # ================================================== geometry probes
    coords_stack = None

    def geom_stacks(iters):
        nonlocal coords_stack
        if coords_stack is None or coords_stack[0].shape[0] < iters:
            coords_stack = (
                jnp.asarray(rng.standard_normal((ITERS_B, B, N, 3))
                            .astype(np.float32) / 3.0),
            )
        return (coords_stack[0][:iters],)

    import point_sam_tpu.ops.knn as knn_mod  # the MODULE (ops re-exports
    # the function under the same name, so `from ops import knn` is wrong)
    from point_sam_tpu.ops import fps as fps_op
    from point_sam_tpu.ops.group import batch_index_select, group_points
    from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

    centers_fn = jax.jit(lambda c: batch_index_select(
        c, fps_op(c, G), axis=1))

    def g_probe(fn):
        def probe():
            def run(iters):
                (cs,) = geom_stacks(iters)
                cents = jnp.stack([centers_fn(cs[i]) for i in range(iters)])

                @jax.jit
                def many(cs, cents):
                    def step(acc, xs):
                        out = fn(*xs)
                        leaves = jax.tree_util.tree_leaves(out)
                        return acc + sum(
                            jnp.sum(jnp.abs(x).astype(jnp.float32))
                            for x in leaves), None
                    acc, _ = jax.lax.scan(step, jnp.float32(0), (cs, cents))
                    return acc

                float(many(cs, cents)); float(many(cs, cents))
                return min(_timeit(lambda: float(many(cs, cents)))
                           for _ in range(3))

            ta, tb = run(ITERS_A), run(ITERS_B)
            return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

        return probe

    stage("g_knn", g_probe(
        lambda c, cent: knn_mod.knn(cent, c, K, method="approx",
                                    recall_target=0.9)[1]))
    stage("g_interp", g_probe(
        lambda c, cent: interp_weights_pallas(c, cent)))
    for tq in (256, 1024):
        stage(f"g_interp_tq{tq}", g_probe(
            functools.partial(
                lambda c, cent, tq=tq: interp_weights_pallas(
                    c, cent, tile_q=tq))))

    # gather + pointnet need knn_idx; precompute per iteration
    knn_fn = jax.jit(lambda c, cent: knn_mod.knn(
        cent, c, K, method="approx", recall_target=0.9)[1])

    def g_gather():
        def run(iters):
            (cs,) = geom_stacks(iters)
            cents = jnp.stack([centers_fn(cs[i]) for i in range(iters)])
            idxs = jnp.stack([knn_fn(cs[i], cents[i]) for i in range(iters)])
            feats = jnp.asarray(
                rng.random((iters, B, N, 3)).astype(np.float32))

            @jax.jit
            def many(cs, cents, idxs, feats):
                def step(acc, xs):
                    c, cent, idx, f = xs
                    g = group_points(c, f, cent, idx)
                    return acc + jnp.sum(jnp.abs(g).astype(jnp.float32)), None
                acc, _ = jax.lax.scan(step, jnp.float32(0),
                                      (cs, cents, idxs, feats))
                return acc

            args = (cs, cents, idxs, feats)
            float(many(*args)); float(many(*args))
            return min(_timeit(lambda: float(many(*args))) for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    stage("g_gather", g_gather)

    def g_pointnet():
        from point_sam_tpu.ops.patch_encoder_pallas import patch_encoder_fused

        C_IN, H0, H1, C_OUT = 6, 128, 512, 512
        params = tuple(
            jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)
            for s in [(C_IN, H0), (H0,), (H0,), (H0,), (H0, H0), (H0,),
                      (2 * H0, H1), (H1,), (H1,), (H1,), (H1, C_OUT), (C_OUT,)]
        )

        def run(iters):
            xs = jnp.asarray(
                rng.standard_normal((iters, B, G * K, C_IN))
                .astype(np.float32), bf16)

            @jax.jit
            def many(xs, params):
                def step(acc, x):
                    out = patch_encoder_fused(
                        x, params, num_groups=G, group_size=K, cdt=bf16)
                    return acc + jnp.sum(jnp.abs(out).astype(jnp.float32)), None
                acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
                return acc

            float(many(xs, params)); float(many(xs, params))
            return min(_timeit(lambda: float(many(xs, params)))
                       for _ in range(3))

        ta, tb = run(ITERS_A), run(ITERS_B)
        return max(tb - ta, 1e-9) / (ITERS_B - ITERS_A)

    stage("g_pointnet", g_pointnet)

    print(json.dumps({k: (round(v * 1e3, 3) if v is not None else None)
                      for k, v in state.items()}))


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
