"""Headline benchmark: encoder throughput on 100k-point clouds + train step.

Workload = BASELINE.md north-star config: ViT-L (eva02_large) Point-SAM
encode of a 100,000-point cloud with G=2048 patches of K=256 neighbors
(the reference's large-scene eval setting, evaluation/eval_kitti.py:350-362),
bf16 compute on TPU. "Encode" covers the full tokenize+embed pipeline:
FPS -> kNN -> grouping -> PointNet patch encoder -> ViT -> out_proj, plus
the 3-NN interpolation-weight precompute (cached for all later clicks).
Also measured: decode-only clicks/sec against a cached encoding, and the
ViT-L TRAINING step at the released-checkpoint config (G=1024/K=256, B=2,
N=10k, M=2 masks, 5 click iterations — reference configs/large.yaml:10-27,
scripts/train_large.sh).

Measurement methodology: the axon-tunneled TPU attachment has a ~25-30 ms
per-dispatch floor (a trivial jitted op measures ~30 ms wall, and
dispatches do not pipeline through the tunnel), so raw single-call timings
overstate device time by tens of ms. Every encode stage runs ITERS
iterations over DISTINCT inputs inside ONE jitted ``lax.scan`` (distinct
inputs prevent CSE; a scalar checksum readback forces completion), so the
per-call floor amortizes to <= floor/ITERS. The full encode is measured as
TWO such programs — geometry, then patch-embed->ViT->projections — and
summed: the single-program formulation (100k-point geometry + the scanned
ViT in one jit) reproducibly wedges the remote XLA compile service (r2
finding, with and without remat), while the halves compile in seconds;
serving uses the same split (predictor caches geometry per cloud). The
train step is timed per dispatch minus the measured floor.

Resumability: the remote compile tunnel degrades under sustained compile
load and occasionally drops connections mid-run (r2 finding). Every
completed measurement is checkpointed to ``BENCH_STATE`` (default
/tmp/bench_state.json); a rerun skips finished stages, so a tunnel crash
costs one stage, not the run. Delete the state file for a fresh run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is a documented per-stage engineering estimate of the reference
PyTorch pipeline on A100 at this config (reference call stack SURVEY.md
§3.1; stage list pc_sam/model/common.py + pc_encoder.py):
  - torkit3d CUDA FPS, 2048 of 100k:                   ~15 ms
  - torch.cdist [2048, 100k] + topk(256) (kNN):        ~60 ms
    (the 0.8 GB distance matrix is materialized and torch.topk over 100k
     keys/row is sort-based)
  - torch.cdist [100k, 2048] + topk(3) (interp):       ~40 ms
  - neighbor gathers + PointNet patch encoder:         ~15 ms
  - timm EVA02-L forward, 2048 tokens, bf16 SDPA:      ~12 ms
  ==> ~140 ms/cloud ==> ~7 clouds/sec on A100.
This estimate is necessarily rough (+-2x); ms_per_cloud is reported so the
raw number stands on its own. BASELINE.json's north star is 10x A100.
"""

from __future__ import annotations

import json
import os
import time

A100_BASELINE_CLOUDS_PER_SEC = 7.0


def main():
    small = os.environ.get("BENCH_SMALL") == "1"

    import jax

    if os.environ.get("BENCH_CPU") == "1":
        # Debug/smoke path: the axon sitecustomize overrides JAX_PLATFORMS,
        # so force the CPU backend via config (CLAUDE.md gotchas).
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from point_sam_tpu.models import (
        PointCloudSAM,
        PointSAMConfig,
        TokenizerConfig,
        compute_geometry,
        init_variables,
    )
    from point_sam_tpu.ops import fps

    # ------------------------------------------------- resumable state file
    state_path = os.environ.get("BENCH_STATE", "/tmp/bench_state.json")
    if small:
        state_path += ".small"
    # Bump when the timing METHODOLOGY changes (e.g. the r3 floor
    # subtraction): resuming a state file written under a different
    # methodology would silently mix incompatible numbers in one report —
    # exactly the "compare only same-methodology deltas" trap.
    METHODOLOGY = "r3-floor-subtracted-v2"
    try:
        with open(state_path) as f:
            state = json.load(f)
        if state.get("_methodology") != METHODOLOGY:
            print(f"# discarding stale bench state ({state_path}): "
                  f"methodology {state.get('_methodology')!r} != "
                  f"{METHODOLOGY!r}", flush=True)
            state = {}
    except Exception:
        state = {}
    state["_methodology"] = METHODOLOGY

    def stage(key, fn):
        if key not in state:
            state[key] = fn()
            with open(state_path, "w") as f:
                json.dump(state, f)
            print(f"# stage {key}: {state[key]}", flush=True)
        return state[key]

    on_tpu = jax.default_backend() == "tpu"
    if small:
        N, G, K, BATCHES, ITERS, REPS = 4096, 128, 32, (2,), 2, 2
        vit = "tiny"
    else:
        N, G, K, BATCHES, ITERS, REPS = 100_000, 2048, 256, (4, 8, 16), 12, 3
        vit = "eva02_large"

    rng = np.random.default_rng(0)

    # ------------------------------------------------------ dispatch floor
    # One tunnel round-trip for a trivially small program: everything timed
    # by plain dispatch below subtracts this.
    trivial = jax.jit(lambda x: jnp.sum(x * 2.0))
    xtiny = jnp.ones((128, 128), jnp.float32)
    float(trivial(xtiny))
    floor = stage(
        "floor",
        lambda: min(_timeit(lambda: float(trivial(xtiny))) for _ in range(10)),
    )
    # Guard against a poisoned run: the tunnel floor is ~25-35 ms on a
    # quiet host; a fat floor means something else is hogging the (single)
    # CPU and every stage timed under it is garbage (this exact failure
    # produced an unusable r4 state file: floor=132 ms while pytest ran).
    if on_tpu and not small and floor > 0.06:
        raise SystemExit(
            f"dispatch floor {floor*1e3:.0f} ms >> the ~30 ms tunnel "
            "round-trip: host is contended; free the CPU, delete "
            f"{state_path} and rerun")

    # ------------------------------------------- train step (clouds/sec)
    # The train stage runs FIRST: model params + optimizer state for ViT-L
    # are ~6 GB on their own, and together with the inference model's
    # params the combined footprint exceeds v5e HBM (r2 OOM). Running it
    # before anything else allocates keeps the peak bounded; its arrays
    # are freed when measure_train returns.
    # Released-checkpoint train config (reference configs/large.yaml:10-27):
    # ViT-L, G=1024/K=256, batch 2, 10k points, 2 masks, 5 click iters.
    if small:
        tN, tG, tK, tB, tM = 1024, 64, 16, 2, 2
    else:
        tN, tG, tK, tB, tM = 10_000, 1024, 256, 2, 2

    def measure_train():
        from point_sam_tpu.models import criterion as criterion_fn
        from point_sam_tpu.parallel import (
            TrainState,
            make_mesh,
            make_optimizer,
            make_train_step,
            replicate,
        )
        from point_sam_tpu.train.schedule import warmup_multistep

        train_tok = TokenizerConfig(num_patches=tG, patch_size=tK)
        train_cfg = PointSAMConfig(vit=vit, tokenizer=train_tok,
                                   prompt_iters=5)
        train_model = PointCloudSAM(
            train_cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32
        )
        tx = make_optimizer(
            warmup_multistep(3e-4, [10_000], warmup_iters=100),
            weight_decay=0.1,
            max_grad_value=1.0,
        )
        tvars = init_variables(train_model, jax.random.PRNGKey(1))
        params = tvars["params"]
        buffers = {k: v for k, v in tvars.items() if k != "params"}
        mesh = make_mesh()
        state_tr = replicate(TrainState.create(params, buffers, tx), mesh)
        # Free the pre-replication host/device copies: together with the
        # inference params they push the train stage over v5e HBM.
        del tvars, params, buffers
        # donate=True (like the real trainer): without donation the old
        # and new optimizer states are live simultaneously (~8.4 GB for
        # ViT-L + Adam) and the step OOMs v5e HBM. Timed calls thread the
        # returned state back in, so donation is safe.
        step_fn = make_train_step(
            train_model, tx, mesh, criterion=criterion_fn, donate=True
        )

        n_tb = 4
        tbatches = [
            {
                "coords": jnp.asarray(
                    rng.standard_normal((tB, tN, 3)).astype(np.float32) / 3.0
                ),
                "features": jnp.asarray(
                    rng.random((tB, tN, 3)).astype(np.float32)
                ),
                "gt_masks": jnp.asarray(rng.random((tB, tM, tN)) < 0.3),
            }
            for _ in range(n_tb)
        ]
        rngs = jax.random.split(jax.random.PRNGKey(2), n_tb)

        state_box = [state_tr]

        def train_call(i):
            st, metrics = step_fn(state_box[0], tbatches[i], rngs[i])
            state_box[0] = st
            return float(metrics["loss"])

        train_call(0)  # compile + warm
        train_call(0)
        t_train_raw = float("inf")
        for _ in range(REPS):
            for i in range(n_tb):
                t_train_raw = min(t_train_raw, _timeit(lambda: train_call(i)))
        return max(t_train_raw - floor, 1e-9)

    t_train = stage("train", measure_train)
    train_clouds_per_sec = tB / t_train


    tok = TokenizerConfig(num_patches=G, patch_size=K)
    # vit_remat=False: no backward pass here, and the remat+scan encode
    # graph wedges the remote compiler (models/pc_sam.py::for_inference).
    # patch_act="tanh": the inference operating point (r5) — tanh-approx
    # GELU in the fused patch encoder, ~1.7 ms/cloud at this config,
    # <=~3e-4 deviation (PointSAMConfig.patch_act; PARITY.md). The train
    # stage above keeps erf for reference-recipe parity.
    cfg = PointSAMConfig(vit=vit, tokenizer=tok, prompt_iters=5,
                         vit_remat=False, patch_act="tanh")
    model = PointCloudSAM(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    variables = init_variables(model, jax.random.PRNGKey(0))
    if on_tpu:
        # Bit-identical (flax casts kernels to bf16 per dispatch anyway);
        # removes ~1.8 GB/dispatch of fp32->bf16 ViT-L weight-convert HBM
        # traffic from every inference stage (models/pc_sam.py).
        from point_sam_tpu.models import cast_params_for_inference

        variables = cast_params_for_inference(variables)
    jax.block_until_ready(variables)

    def make_stack(iters, b):
        return (
            jnp.asarray(
                rng.standard_normal((iters, b, N, 3)).astype(np.float32) / 3.0
            ),
            jnp.asarray(rng.random((iters, b, N, 3)).astype(np.float32)),
        )

    def timed_scan(fn, *stacks, consts=None):
        """Amortized seconds per iteration of fn over stacked inputs.

        ``variables`` (or ``consts``) is threaded as an explicit jit
        ARGUMENT: a closure over the 1.2 GB ViT-L param tree embeds it as
        constants in the serialized HLO, which kills the remote compile
        helper (r2 root cause of the repeated broken-pipe compile
        failures).
        """
        if consts is None:
            consts = variables

        @jax.jit
        def many(consts, *ss):
            def step(c, xs):
                out = fn(consts, *xs)
                leaves = jax.tree_util.tree_leaves(out)
                return (
                    c
                    + sum(
                        jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in leaves
                    ),
                    None,
                )

            c, _ = jax.lax.scan(step, jnp.float32(0), ss)
            return c

        float(many(consts, *stacks))  # compile
        float(many(consts, *stacks))  # warm
        best = min(
            _timeit(lambda: float(many(consts, *stacks)))
            for _ in range(REPS)
        )
        # One tunnel round trip per many() call: without this, every
        # stage number is inflated by floor/ITERS (~2.5 ms at ITERS=12) —
        # a relay artifact, not device time (r3 finding; the train stage
        # below has always subtracted it). Same correction for all
        # stages keeps them comparable.
        return max(best - floor, 1e-9) / stacks[0].shape[0]

    # ------------------------------------------------------ encode stages
    def run_fps(v, coords, feats):
        return fps(coords, G)

    def run_geom(v, coords, feats):
        return tuple(compute_geometry(coords, tok).values())

    c1, f1 = make_stack(ITERS, 1)
    t_fps = stage("fps", lambda: timed_scan(run_fps, c1, f1))
    t_geom = stage("geom", lambda: timed_scan(run_geom, c1, f1))

    # Patch embed (gather + PointNet) alone, geometry precomputed: isolates
    # the neighbor-gather cost from FPS/kNN and from the ViT.
    geom_fn = jax.jit(lambda c: compute_geometry(c, tok))

    _geom_stack_cache = {}

    def geom_stack_for(cb, iters):
        # memoized per input stack: the embed and encode_rest stages share
        # the b=1 stack, and each 100k-point geometry dispatch costs a full
        # tunnel round trip. Keyed by shape (stable) with the source array
        # pinned in the entry so a recycled id can never alias a stale
        # stack; identity is re-checked on hit.
        key = (cb.shape, iters)
        hit = _geom_stack_cache.get(key)
        if hit is None or hit[0] is not cb:
            geoms = [geom_fn(cb[i]) for i in range(iters)]
            stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *geoms)
            _geom_stack_cache[key] = (cb, stack)
            return stack
        return hit[1]

    def run_embed(v, coords, feats, geom):
        return model.apply(
            v, coords, feats, geom,
            method=lambda m, c, f, g: m.patch_embed(c, f, g),
        )

    t_embed = stage(
        "embed",
        lambda: timed_scan(run_embed, c1, f1, geom_stack_for(c1, ITERS)),
    )

    # -------------------------------------------------- full encode (sum)
    # Encode time = geometry + (patch embed -> ViT -> projections), each
    # scan-amortized in its own executable. The single-program formulation
    # (geometry + scanned ViT in one jit) reproducibly wedges the remote
    # XLA compile service (r2 finding, with and without remat), while the
    # two halves compile in seconds — and scan amortization beats
    # dispatch-floor subtraction anyway. Serving pays one extra dispatch
    # per cloud at the same split (serving/predictor.py caches geometry
    # separately for exactly this structure).
    def run_encode_rest(v, coords, feats, geom):
        emb, pe = model.apply(v, coords, feats, geom, method=model.encode)
        return emb

    t_rest = stage(
        "encode_rest",
        lambda: timed_scan(run_encode_rest, c1, f1, geom_stack_for(c1, ITERS)),
    )
    t_b1 = t_geom + t_rest

    # ------------------------------------------------- decode (clicks/sec)
    # Batched multi-prompt decode against a CACHED encoding (the
    # interactive serving hot path; BASELINE.md "clicks/sec decode").
    M = 2 if small else 8

    def measure_decode():
        coords0, feats0 = c1[0], f1[0]
        geom = geom_fn(coords0)
        emb, pe = jax.jit(
            lambda v, c, f, g: model.apply(v, c, f, g, method=model.encode)
        )(variables, coords0, feats0, geom)
        jax.block_until_ready(emb)
        pc_stack = jnp.asarray(
            rng.standard_normal((ITERS, M, 1, 3)).astype(np.float32) / 3.0
        )
        pl_ = jnp.ones((M, 1), bool)

        def run_decode(v, pc):
            masks, ious = model.apply(
                v, emb, pe, coords0, geom, pc, pl_, None,
                prompt_valid=jnp.ones((M, 1), bool), multimask_output=True,
                method=model.decode,
            )
            # Consume the MASKS, not just the ious: the [M, N]-point mask
            # upscaling is the decode hot path, and returning ious alone
            # lets XLA dead-code-eliminate it (r4 catch: 0.03 ms/batch).
            return masks, ious

        return timed_scan(run_decode, pc_stack)

    t_decode = stage("decode", measure_decode)
    clicks_per_sec = M / t_decode

    # ------------------------------------------------------ batched encode
    # Last: each batch size compiles its own geometry + encode executables.
    n_bi = 3
    batched = {}
    batched_split = {}
    for b in BATCHES:
        def measure_bN(b=b):
            # Split recorded per stage (VERDICT r3 #4): whether batching
            # stalls in the geometry kernels or the ViT is diagnosable
            # straight from the bench artifact.
            cb, fb = make_stack(n_bi, b)
            gs = geom_stack_for(cb, n_bi)
            t_geom_b = timed_scan(run_geom, cb, fb)
            t_rest_b = timed_scan(run_encode_rest, cb, fb, gs)
            return {"geom": t_geom_b, "rest": t_rest_b}

        t_bN = stage(f"encode_split_b{b}", measure_bN)
        batched[b] = b / (t_bN["geom"] + t_bN["rest"])
        batched_split[b] = t_bN

    # ------------------------------------- EVA-giant + voronoi (config #5)
    # BASELINE workload #5 (reference configs/voronoi_giant.yaml): voronoi
    # tokenizer (1024 cells) + EVA-giant ViT (40 x 1408). Encode-only at
    # the 100k-point eval scale: a single v5e cannot hold giant fp32
    # params + AdamW moments (~16 GB) for an on-chip train-step stage —
    # giant TRAINING is multi-chip FSDP territory, whose sharding layout
    # the driver validates via __graft_entry__.dryrun_multichip.
    def measure_giant():
        from point_sam_tpu.models import for_inference
        from point_sam_tpu.utils.config import build_model, load_config

        # Smoke mode swaps the 1B-param backbone for tiny (a full EVA-giant
        # CPU forward is ~90 s/cloud); the real run measures eva_giant.
        gcfg = load_config("voronoi_giant",
                           ["model.vit=tiny"] if small else [])
        gmodel = for_inference(build_model(
            gcfg.model, dtype=jnp.bfloat16 if on_tpu else jnp.float32))
        gvars = init_variables(gmodel, jax.random.PRNGKey(3))
        if on_tpu:
            from point_sam_tpu.models import cast_params_for_inference

            gvars = cast_params_for_inference(gvars)
        jax.block_until_ready(gvars)
        g_iters = 2 if small else 6
        cg, fg = make_stack(g_iters, 1)
        geom_fn_g = jax.jit(lambda c: gmodel.make_geometry(c))
        geoms = [geom_fn_g(cg[i]) for i in range(g_iters)]
        gstack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *geoms)
        t_ggeom = timed_scan(
            lambda v, c, f: tuple(gmodel.make_geometry(c).values()),
            cg, fg, consts=gvars)
        t_grest = timed_scan(
            lambda v, c, f, g: gmodel.apply(v, c, f, g,
                                            method=gmodel.encode)[0],
            cg, fg, gstack, consts=gvars)
        return {"geom": t_ggeom, "rest": t_grest}

    t_giant = stage("giant_encode", measure_giant)
    giant_ms_per_cloud = (t_giant["geom"] + t_giant["rest"]) * 1e3

    clouds_per_sec_b1 = 1.0 / t_b1
    clouds_per_sec = max([clouds_per_sec_b1, *batched.values()])

    result = {
        "metric": "encode_clouds_per_sec_100k_G2048_K256_vitL"
        if not small
        else "encode_clouds_per_sec_small_smoke",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / A100_BASELINE_CLOUDS_PER_SEC, 3),
        "ms_per_cloud_b1": round(t_b1 * 1e3, 2),
        "clouds_per_sec_b1": round(clouds_per_sec_b1, 2),
        "clouds_per_sec_batched": {
            str(b): round(v, 2) for b, v in batched.items()
        },
        "batched_ms_per_batch": {
            str(b): {k: round(v * 1e3, 2) for k, v in s.items()}
            for b, s in batched_split.items()
        },
        "stages_ms_b1": {
            "fps": round(t_fps * 1e3, 2),
            "knn_interp": round((t_geom - t_fps) * 1e3, 2),
            "group_pointnet": round(t_embed * 1e3, 2),
            "vit": round((t_b1 - t_geom - t_embed) * 1e3, 2),
        },
        "dispatch_floor_ms": round(floor * 1e3, 2),
        "decode_clicks_per_sec": round(clicks_per_sec, 2),
        "decode_ms_per_batch": round(t_decode * 1e3, 2),
        "giant_voronoi_encode_ms_per_cloud": round(giant_ms_per_cloud, 2),
        "giant_voronoi_config": "eva_giant 40x1408 + voronoi 1024 cells, "
        f"N={N}, B=1 (BASELINE workload #5; encode-only — giant+AdamW "
        "exceeds one v5e HBM, giant training is multi-chip FSDP, layout "
        "dryrun-validated)",
        "train_clouds_per_sec": round(train_clouds_per_sec, 2),
        "train_ms_per_step": round(t_train * 1e3, 2),
        "train_config": f"vitL_G{tG}_K{tK}_B{tB}_N{tN}_M{tM}_5iters",
        "backend": jax.default_backend(),
        "measurement": "all encode stages amortized in-jit over "
        f"{ITERS}-iteration scans (encode = geometry + rest, two "
        "executables — see bench.py docstring); train timed per dispatch "
        "minus the measured tunnel floor; resumable per-stage state",
        "baseline_note": "A100 torch reference estimated at "
        f"{A100_BASELINE_CLOUDS_PER_SEC:.0f} clouds/sec from a per-stage "
        "breakdown (see bench.py docstring; no published numbers exist). "
        "north-star: vs_baseline >= 10",
    }
    print(json.dumps(result))


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
