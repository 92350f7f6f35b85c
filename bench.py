"""Headline benchmark: encoder throughput on 100k-point clouds.

Workload = BASELINE.md north-star config: ViT-L (eva02_large) Point-SAM
encode of a 100,000-point cloud with G=2048 patches of K=256 neighbors
(the reference's large-scene eval setting, evaluation/eval_kitti.py:350-362),
bf16 compute on TPU. "Encode" covers the full tokenize+embed pipeline:
FPS -> kNN -> grouping -> PointNet patch encoder -> ViT -> out_proj, plus
the 3-NN interpolation-weight precompute (cached for all later clicks).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is a documented per-stage engineering estimate of the reference
PyTorch pipeline on A100 at this config (reference call stack SURVEY.md
§3.1; stage list pc_sam/model/common.py + pc_encoder.py):
  - torkit3d CUDA FPS, 2048 of 100k:                   ~15 ms
  - torch.cdist [2048, 100k] + topk(256) (kNN):        ~60 ms
    (the 0.8 GB distance matrix is materialized and torch.topk over 100k
     keys/row is sort-based — the same selection cost that dominated our
     first TPU implementation)
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
    )

    on_tpu = jax.default_backend() == "tpu"
    if small:
        N, G, K, B = 4096, 128, 32, 1
        vit = "tiny"
    else:
        N, G, K, B = 100_000, 2048, 256, 1
        vit = "eva02_large"

    tok = TokenizerConfig(num_patches=G, patch_size=K)
    cfg = PointSAMConfig(vit=vit, tokenizer=tok, prompt_iters=5)
    model = PointCloudSAM(cfg, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    rng = np.random.default_rng(0)
    coords = jnp.asarray(
        rng.standard_normal((B, N, 3)).astype(np.float32) / 3.0
    )
    feats = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))

    # Jitted init (op-by-op dispatch through the device tunnel is slow).
    from point_sam_tpu.models import init_variables

    variables = init_variables(model, jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    @jax.jit
    def encode(variables, coords, feats):
        geom = compute_geometry(coords, tok)
        emb, pe = model.apply(
            variables, coords, feats, geom, method=model.encode
        )
        # Scalar checksum forces a host readback per call: on remote-attached
        # backends block_until_ready alone can return before execution
        # completes, which silently inflates throughput numbers.
        return emb, pe, jnp.sum(jnp.abs(emb).astype(jnp.float32))

    def run():
        out = encode(variables, coords, feats)
        return float(out[2])

    run()  # compile
    run()  # warm
    iters = 3 if small else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    clouds_per_sec_b1 = B / dt

    # Batched encode (the north-star explicitly asks batched multi-cloud
    # encoding to saturate the MXU rather than serialize): measure B=4.
    B4 = 2 if small else 4
    coords4 = jnp.asarray(
        rng.standard_normal((B4, N, 3)).astype(np.float32) / 3.0
    )
    feats4 = jnp.asarray(rng.random((B4, N, 3)).astype(np.float32))

    def run4():
        out = encode(variables, coords4, feats4)
        return float(out[2])

    run4()
    run4()
    t0 = time.perf_counter()
    for _ in range(iters):
        run4()
    dt4 = (time.perf_counter() - t0) / iters
    clouds_per_sec = max(clouds_per_sec_b1, B4 / dt4)

    # Decode rate: batched multi-prompt decode against a CACHED encoding
    # (the interactive serving hot path; BASELINE.md "clicks/sec decode").
    # Precompute the encoding once so the measurement is decode-only.
    M = 2 if small else 8

    @jax.jit
    def encode_full(variables, coords, feats):
        geom = compute_geometry(coords, tok)
        emb, pe = model.apply(
            variables, coords, feats, geom, method=model.encode
        )
        return emb, pe, geom

    emb, pe, geom = encode_full(variables, coords, feats)
    jax.block_until_ready(emb)

    @jax.jit
    def decode_only(variables, emb, pe, coords, geom, pc, pl_):
        masks, ious = model.apply(
            variables, emb, pe, coords, geom, pc, pl_, None,
            prompt_valid=jnp.ones((M, 1), bool), multimask_output=True,
            method=model.decode,
        )
        return jnp.sum(jnp.abs(ious).astype(jnp.float32)), masks

    pc = jnp.tile(coords[:, :1, :], (M, 1, 1))
    pl_ = jnp.ones((M, 1), bool)

    def run_decode():
        out = decode_only(variables, emb, pe, coords, geom, pc, pl_)
        return float(out[0])

    run_decode()
    run_decode()
    t0 = time.perf_counter()
    for _ in range(iters):
        run_decode()
    dt_decode = (time.perf_counter() - t0) / iters
    clicks_per_sec = M / dt_decode
    result = {
        "metric": "encode_clouds_per_sec_100k_G2048_K256_vitL"
        if not small
        else "encode_clouds_per_sec_small_smoke",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / A100_BASELINE_CLOUDS_PER_SEC, 3),
        "ms_per_cloud_b1": round(dt * 1e3 / B, 2),
        "clouds_per_sec_b1": round(clouds_per_sec_b1, 2),
        "clouds_per_sec_batched": round(B4 / dt4, 2),
        "batch_size_batched": B4,
        "decode_clicks_per_sec": round(clicks_per_sec, 2),
        "decode_ms_per_batch": round(dt_decode * 1e3, 2),
        "backend": jax.default_backend(),
        "baseline_note": "A100 torch reference estimated at "
        f"{A100_BASELINE_CLOUDS_PER_SEC:.0f} clouds/sec from a per-stage "
        "breakdown (see bench.py docstring; no published numbers exist). "
        "north-star: vs_baseline >= 10",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
