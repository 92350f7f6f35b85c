"""Train-step decomposition benchmark (round-3 perf work, VERDICT #3).

Breaks the 312 ms ViT-L train step (G=1024, K=256, B=2, N=10k, M=2,
5 click iters — reference configs/large.yaml) into stages to find where
the non-FLOP slop lives:

  step_full      full value_and_grad + adamw update     (bench.py's 312 ms)
  fwd_loss       loss_fn forward only
  vag_full       value_and_grad only (no optimizer)
  vag_iters1     value_and_grad with prompt_iters=1
  grad_encode    grad of encode-only (patch embed + ViT)
  mask_enc_fwd   mask prompt encoder forward (BM=4 rows)
  mask_enc_vjp   mask prompt encoder fwd+bwd (param grads)
  decode_fwd     one full decode pass (mask enc + transformer + interp)
  sampler5       5x sample_prompts
  opt_update     adamw update alone on ViT-L grads

Per-iteration decode cost = (vag_full - vag_iters1) / 4.
Methodology: scan over distinct inputs inside one jit where shapes allow,
else per-dispatch minus the measured tunnel floor. Resumable state file.
"""

from __future__ import annotations

import json
import os
import time

STATE_PATH = os.environ.get("TBENCH_STATE", "/tmp/tbench_state.json")


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
        criterion as criterion_fn,
        init_variables,
    )
    from point_sam_tpu.ops import sample_prompts

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

    tN, tG, tK, tB, tM = 10_000, 1024, 256, 2, 2
    REPS = 5
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    tok = TokenizerConfig(num_patches=tG, patch_size=tK)
    cfg5 = PointSAMConfig(vit="eva02_large", tokenizer=tok, prompt_iters=5)
    cfg1 = PointSAMConfig(vit="eva02_large", tokenizer=tok, prompt_iters=1)
    model5 = PointCloudSAM(cfg5, dtype=cdt)
    model1 = PointCloudSAM(cfg1, dtype=cdt)

    tvars = init_variables(model5, jax.random.PRNGKey(1))
    params = tvars["params"]
    buffers = {k: v for k, v in tvars.items() if k != "params"}
    del tvars
    jax.block_until_ready(params)

    # dispatch floor
    trivial = jax.jit(lambda x: jnp.sum(x * 2.0))
    xtiny = jnp.ones((128, 128), jnp.float32)
    float(trivial(xtiny))
    floor = stage(
        "floor",
        lambda: min(_timeit(lambda: float(trivial(xtiny))) for _ in range(8)),
    )

    n_b = 4
    batches = [
        {
            "coords": jnp.asarray(
                rng.standard_normal((tB, tN, 3)).astype(np.float32) / 3.0),
            "features": jnp.asarray(rng.random((tB, tN, 3)).astype(np.float32)),
            "gt_masks": jnp.asarray(rng.random((tB, tM, tN)) < 0.3),
        }
        for _ in range(n_b)
    ]
    rngs = jax.random.split(jax.random.PRNGKey(2), n_b)

    def loss_fn(model):
        def f(p, bufs, batch, r):
            outputs = model.apply(
                {"params": p, **bufs}, batch["coords"], batch["features"],
                batch["gt_masks"], rngs={"sampler": r})
            B, M, N = batch["gt_masks"].shape
            loss, aux = criterion_fn(outputs, batch["gt_masks"].reshape(B * M, N))
            return loss
        return f

    def timed_dispatch(key, make_call):
        def run():
            call = make_call()
            call(0); call(0)  # compile + warm
            best = float("inf")
            for _ in range(REPS):
                for i in range(n_b):
                    best = min(best, _timeit(lambda: call(i)))
            return max(best - floor, 1e-9)
        return stage(key, run)

    # ---- forward only
    def mk_fwd(model):
        f = jax.jit(loss_fn(model))
        return lambda: (lambda i: float(f(params, buffers, batches[i], rngs[i])))

    timed_dispatch("fwd_loss", mk_fwd(model5))
    timed_dispatch("fwd_loss_iters1", mk_fwd(model1))

    # ---- value_and_grad (no optimizer)
    def mk_vag(model):
        g = jax.jit(jax.value_and_grad(loss_fn(model)))
        def call(i):
            l, grads = g(params, buffers, batches[i], rngs[i])
            # tiny readback to force completion without pulling grads
            return float(l) + float(
                jax.tree_util.tree_leaves(grads)[0].ravel()[0])
        return lambda: call

    timed_dispatch("vag_full", mk_vag(model5))
    timed_dispatch("vag_iters1", mk_vag(model1))

    # ---- grad of encode only
    def enc_loss(p, bufs, batch):
        geom = model5.make_geometry(batch["coords"])
        emb, pe = model5.apply({"params": p, **bufs}, batch["coords"],
                               batch["features"], geom, method=model5.encode)
        return jnp.sum(jnp.abs(emb).astype(jnp.float32))

    g_enc = jax.jit(jax.value_and_grad(enc_loss))

    def enc_call(i):
        l, grads = g_enc(params, buffers, batches[i])
        return float(l) + float(jax.tree_util.tree_leaves(grads)[0].ravel()[0])

    timed_dispatch("grad_encode", lambda: enc_call)

    # ---- geometry alone (fps+knn+interp at train shapes)
    geom_fn = jax.jit(lambda c: jax.tree_util.tree_map(
        lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))),
        model5.make_geometry(c)))

    def geom_call(i):
        return sum(float(v) for v in
                   jax.tree_util.tree_leaves(geom_fn(batches[i]["coords"])))

    timed_dispatch("geom_train", lambda: geom_call)

    # ---- mask encoder fwd / vjp (needs a geometry)
    geom0 = jax.jit(model5.make_geometry)(batches[0]["coords"])
    jax.block_until_ready(geom0)
    masks_in = [jnp.asarray(
        rng.standard_normal((tB * tM, tN)).astype(np.float32)) for _ in range(n_b)]

    def me_apply(p, bufs, m, coords, centers, knn_idx):
        out = model5.apply(
            {"params": p, **bufs}, m, coords, centers, knn_idx,
            method=lambda mod, a, b, c, d: mod.mask_encoder(a, b, c, d))
        return jnp.sum(jnp.abs(out).astype(jnp.float32))

    me_fwd = jax.jit(me_apply)

    def me_fwd_call(i):
        return float(me_fwd(params, buffers, masks_in[i], batches[0]["coords"],
                            geom0["centers"], geom0["knn_idx"]))

    timed_dispatch("mask_enc_fwd", lambda: me_fwd_call)

    me_vjp = jax.jit(jax.value_and_grad(me_apply))

    def me_vjp_call(i):
        l, g = me_vjp(params, buffers, masks_in[i], batches[0]["coords"],
                      geom0["centers"], geom0["knn_idx"])
        return float(l) + float(jax.tree_util.tree_leaves(g)[0].ravel()[0])

    timed_dispatch("mask_enc_vjp", lambda: me_vjp_call)

    # ---- one full decode pass fwd (with mask prompt)
    pc_emb, pc_pe = jax.jit(
        lambda p, bufs, c, f, g: model5.apply(
            {"params": p, **bufs}, c, f, g, method=model5.encode)
    )(params, buffers, batches[0]["coords"], batches[0]["features"], geom0)
    jax.block_until_ready((pc_emb, pc_pe))
    pcoords = [jnp.asarray(
        rng.standard_normal((tB * tM, 5, 3)).astype(np.float32)) for _ in range(n_b)]
    plabels = jnp.ones((tB * tM, 5), bool)

    def dec_apply(p, bufs, emb, pe, coords, pm, pc):
        masks, ious = model5.apply(
            {"params": p, **bufs}, emb, pe, coords, geom0, pc, plabels, pm,
            method=model5.decode)
        return jnp.sum(jnp.abs(masks).astype(jnp.float32))

    dec_fwd = jax.jit(dec_apply)

    def dec_call(i):
        return float(dec_fwd(params, buffers, pc_emb, pc_pe,
                             batches[0]["coords"], masks_in[i], pcoords[i]))

    timed_dispatch("decode_fwd", lambda: dec_call)

    dec_vjp = jax.jit(jax.value_and_grad(dec_apply))

    def dec_vjp_call(i):
        l, g = dec_vjp(params, buffers, pc_emb, pc_pe,
                       batches[0]["coords"], masks_in[i], pcoords[i])
        return float(l) + float(jax.tree_util.tree_leaves(g)[0].ravel()[0])

    timed_dispatch("decode_vjp", lambda: dec_vjp_call)

    # ---- mask encoder fwd with the cached rel-xyz (round-3: the click
    # loop now gathers only the logit channel per iteration; compare
    # against mask_enc_fwd to see the grouping share)
    from point_sam_tpu.models.prompt_encoder import mask_group_rel_xyz

    rel0 = jax.jit(mask_group_rel_xyz)(
        batches[0]["coords"], geom0["centers"], geom0["knn_idx"])
    jax.block_until_ready(rel0)

    def me_cached_apply(p, bufs, m, coords, centers, knn_idx, rel):
        out = model5.apply(
            {"params": p, **bufs}, m, coords, centers, knn_idx, rel,
            method=lambda mod, a, b, c, d, r: mod.mask_encoder(
                a, b, c, d, rel_xyz=r))
        return jnp.sum(jnp.abs(out).astype(jnp.float32))

    me_cfwd = jax.jit(me_cached_apply)

    def me_cfwd_call(i):
        return float(me_cfwd(params, buffers, masks_in[i],
                             batches[0]["coords"], geom0["centers"],
                             geom0["knn_idx"], rel0))

    timed_dispatch("mask_enc_fwd_cached", lambda: me_cfwd_call)

    me_cvjp = jax.jit(jax.value_and_grad(me_cached_apply))

    def me_cvjp_call(i):
        l, g = me_cvjp(params, buffers, masks_in[i], batches[0]["coords"],
                       geom0["centers"], geom0["knn_idx"], rel0)
        return float(l) + float(jax.tree_util.tree_leaves(g)[0].ravel()[0])

    timed_dispatch("mask_enc_vjp_cached", lambda: me_cvjp_call)

    # ---- sampler x5 (vary pm per step or XLA hoists the loop-invariant
    # sampler body out of the scan and this measures ONE call)
    @jax.jit
    def samp5(coords, gt, pm):
        def step(c, i):
            npc, npl = sample_prompts(coords, gt, pm + c + i)
            return c + jnp.sum(npc) + jnp.sum(npl), None
        c, _ = jax.lax.scan(step, jnp.float32(0),
                            jnp.arange(5, dtype=jnp.float32))
        return c

    def samp_call(i):
        return float(samp5(batches[i]["coords"], batches[i]["gt_masks"],
                           masks_in[i]))

    timed_dispatch("sampler5", lambda: samp_call)

    print(json.dumps(state))


if __name__ == "__main__":
    main()
