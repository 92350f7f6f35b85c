"""A/B harness: what do the TPU-first approximations cost on the end metric?

The evaluator deviates from the reference's exact per-scene policies in
three flag-gated ways (each defensible for bucketed one-executable-per-
bucket compilation, reference eval_kitti.py:350-362):

  1. tokenizer kNN uses ``lax.approx_min_k`` (recall_target 0.9) for big
     clouds instead of exact top-k          (ops/knn.py, knn_method="auto")
  2. per-bucket pow2 G/K instead of the reference's per-scene
     ``G=min(N,2048), K=256, K=2 if N<256``  (gk_policy="bucket_pow2")
  3. optional approximate FPS over a strided candidate subset
     (ops/fps.py ``candidates``; default OFF)

This script measures, on a deterministic synthetic-scene corpus
(datasets/synthetic.py):

  A. model-free geometry surrogates — kNN neighbor recall, FPS coverage
     radius ratio (max-min-distance of approx centers / exact centers);
  B. the end metric — mean IoU per click via InteractiveEvaluator, one run
     per (variant) with everything else held fixed, against a model that
     was actually trained (briefly) so mask quality responds to geometry.

Run:  python -m point_sam_tpu.evalsuite.ab_approx \
          [--scenes 8] [--points 32768] [--clicks 3] \
          [--ckpt <orbax dir or safetensors>] [--config tiny]
      With no --ckpt it first OVERFITS the config on the eval scenes for
      --train-steps (the sensitive instrument for geometry deltas; a
      briefly-trained streaming model plateaus at IoU ~0 and every
      variant reads 0.000).

Output: one JSON report (also markdown-tabled) — paste into PARITY.md.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def geometry_surrogates(scenes, *, num_patches, patch_size, candidates,
                        recall_target=0.9):
    # recall_target default matches the base evaluator's operating point
    # (eval_interactive.InteractiveEvaluator knn_recall_target=0.9) so the
    # surrogate characterizes the same config as the mIoU "base" variant.
    """Model-free deltas: kNN recall + FPS coverage ratio per scene."""
    import jax
    import jax.numpy as jnp

    from ..ops import batch_index_select, fps, knn

    out = {"knn_recall": [], "fps_coverage_ratio": []}
    for xyz in scenes:
        c = jnp.asarray(xyz[None])
        idx_exact = fps(c, num_patches)
        idx_apx = fps(c, num_patches, candidates=candidates)
        cent_exact = batch_index_select(c, idx_exact, axis=1)
        cent_apx = batch_index_select(c, idx_apx, axis=1)

        def cover_radius(centers):
            d2, _ = knn(c, centers, 1, method="exact")
            return float(jnp.sqrt(jnp.max(d2)))

        out["fps_coverage_ratio"].append(
            cover_radius(cent_apx) / max(cover_radius(cent_exact), 1e-12)
        )

        _, nn_exact = knn(cent_exact, c, patch_size, method="exact")
        _, nn_apx = knn(cent_exact, c, patch_size, method="approx",
                        recall_target=recall_target)
        a = np.asarray(nn_exact[0])
        b = np.asarray(nn_apx[0])
        rec = np.mean([
            len(np.intersect1d(a[g], b[g], assume_unique=False)) / a.shape[-1]
            for g in range(a.shape[0])
        ])
        out["knn_recall"].append(float(rec))
    return {k: float(np.mean(v)) for k, v in out.items()}


def make_scenes(num_scenes, num_points, seed=100):
    from ..datasets.synthetic import generate_scene
    from .eval_interactive import filter_masks, normalize_scene

    scenes = []
    for i in range(num_scenes):
        ex = generate_scene(seed + i, num_points=num_points)
        xyz, rgb = normalize_scene(ex["coords"], ex["features"])
        gt = ex["gt_masks"][filter_masks(ex["gt_masks"])]
        if len(gt):
            scenes.append((xyz, rgb, gt))
    return scenes


def miou_run(model, variables, scenes, *, clicks, **evaluator_kw):
    """Returns an [instances, clicks] array of per-instance IoUs.

    Per-INSTANCE results (not per-scene means) so variants can be compared
    PAIRED: instance order is deterministic across variants (same scenes,
    same mask order), which is what makes the bootstrap CI on the deltas
    tight — scene-to-scene IoU variance cancels (VERDICT r2 next #5)."""
    from .eval_interactive import InteractiveEvaluator

    ev = InteractiveEvaluator(model, variables, num_clicks=clicks,
                              masks_per_batch=2, **evaluator_kw)
    rows = []
    for xyz, rgb, gt in scenes:
        ious = ev.evaluate_scene(xyz, rgb, gt)
        rows.append(np.asarray(ious)[:, :clicks])
    return np.concatenate(rows, axis=0)


def paired_delta_ci(variant, base, *, n_boot=10_000, seed=0):
    """Mean paired delta per click + bootstrap 95% CI over instances."""
    d = np.asarray(variant) - np.asarray(base)  # [instances, clicks]
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(d), size=(n_boot, len(d)))
    boots = d[idx].mean(axis=1)  # [n_boot, clicks]
    lo, hi = np.percentile(boots, [2.5, 97.5], axis=0)
    return {
        "mean": [round(float(v), 4) for v in d.mean(0)],
        "ci95": [[round(float(a), 4), round(float(b), 4)]
                 for a, b in zip(lo, hi)],
    }


def get_model_and_weights(args, scenes):
    import jax

    from ..models import init_variables
    from ..utils.config import build_model, load_config

    import jax.numpy as jnp

    cfg = load_config(args.config, [])
    # fp32 even on TPU: the tight same-batch overfit loop diverges in bf16
    # at this lr, and the A/B needs a *stable* probe model far more than
    # encode speed (the geometry variants under test are dtype-independent).
    model = build_model(cfg.model, dtype=jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0))
    if args.ckpt:
        from ..utils.checkpoint import load_variables

        return model, load_variables(args.ckpt, variables)

    # No checkpoint: OVERFIT the model on the eval scenes themselves. The
    # A/B measures the geometry variants' effect on the END metric, not
    # generalization — a model that segments its own training scenes well
    # is the most sensitive instrument (a briefly-trained-on-a-stream tiny
    # model plateaus near zero IoU and every variant reads 0.000; verified
    # r2: the same pipeline overfits any fixed batch to IoU ~0.99).
    return model, _overfit_on_scenes(args, model, variables, scenes)


def _overfit_on_scenes(args, model, variables, scenes, *, points=4096):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import criterion
    from ..parallel import make_optimizer
    from ..train.schedule import warmup_multistep

    params = variables["params"]
    buffers = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(
        warmup_multistep(3e-4, [10 * args.train_steps], warmup_iters=10),
        weight_decay=0.1, max_grad_value=1.0,
    )
    opt = tx.init(params)

    # Fixed-shape batches: subsample each scene to `points`, keep 2 masks.
    rng = np.random.default_rng(0)
    batches = []
    for xyz, rgb, gt in scenes:
        sel = rng.choice(len(xyz), size=points, replace=len(xyz) < points)
        gt_sub = gt[:, sel]
        keep = gt_sub.sum(-1) > 8
        gt_sub = gt_sub[keep][:2]
        if len(gt_sub) == 0:
            continue
        if len(gt_sub) < 2:
            gt_sub = np.concatenate([gt_sub, gt_sub], 0)[:2]
        batches.append((
            jnp.asarray(xyz[None, sel]), jnp.asarray(rgb[None, sel]),
            jnp.asarray(gt_sub[None]),
        ))
    if not batches:
        raise ValueError(
            "every eval scene was filtered out of the overfit corpus "
            f"(masks cover <= 8 of the {points} subsampled points); "
            "raise --points or use scenes with larger instances"
        )

    def loss_fn(params, batch, rng):
        coords, feats, gtm = batch
        outputs = model.apply({"params": params, **buffers}, coords, feats,
                              gtm, rngs={"sampler": rng})
        loss, aux = criterion(outputs, gtm.reshape(-1, gtm.shape[-1]))
        return loss, jnp.mean(aux[-1]["iou"])

    @jax.jit
    def step(params, opt, batch, rng):
        (l, iou), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l, iou

    key = jax.random.PRNGKey(1)
    for i in range(args.train_steps):
        key, k = jax.random.split(key)
        params, opt, l, iou = step(params, opt, batches[i % len(batches)], k)
        if i % 100 == 0 or i == args.train_steps - 1:
            print(f"[overfit step {i}] loss={float(l):.4f} "
                  f"last-iter IoU={float(iou):.3f}", flush=True)
    return {"params": params, **buffers}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="tiny")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--scenes", type=int, default=32)
    parser.add_argument("--points", type=int, default=32768)
    parser.add_argument("--clicks", type=int, default=3)
    parser.add_argument("--train-steps", type=int, default=400)
    parser.add_argument("--fps-candidates", type=int, default=16384)
    parser.add_argument("--geom-patches", type=int, default=2048,
                        help="G for the model-free surrogates")
    parser.add_argument("--geom-patch-size", type=int, default=256)
    args = parser.parse_args(argv)

    import jax

    print(f"backend: {jax.default_backend()}  (approx_min_k is exact on "
          "CPU — run on TPU for the real recall numbers)")

    scenes = make_scenes(args.scenes, args.points)
    print(f"{len(scenes)} scenes x {args.points} points")

    # ---- A. model-free surrogates at the big-scene tokenizer config
    fps_cand = min(args.fps_candidates, args.points)
    surro = geometry_surrogates(
        [s[0] for s in scenes],
        num_patches=min(args.geom_patches, args.points // 4),
        patch_size=args.geom_patch_size,
        candidates=fps_cand,
    )

    # ---- B. end-metric mIoU per click, one variant at a time
    model, variables = get_model_and_weights(args, scenes)
    variants = {
        "base (knn auto, gk bucket_pow2, fps exact)": {},
        "knn exact": dict(knn_method="exact"),
        "knn rt=0.95": dict(knn_recall_target=0.95),
        "gk reference": dict(gk_policy="reference"),
        f"fps candidates={fps_cand}": dict(fps_candidates=fps_cand),
    }
    per_instance = {
        name: miou_run(model, variables, scenes, clicks=args.clicks, **kw)
        for name, kw in variants.items()
    }
    base_name = "base (knn auto, gk bucket_pow2, fps exact)"
    base = per_instance[base_name]
    miou = {name: [round(float(v), 4) for v in vals.mean(0)]
            for name, vals in per_instance.items()}

    report = {
        "backend": jax.default_backend(),
        "corpus": {"scenes": len(scenes),
                   "instances": int(len(base)),
                   "points": args.points,
                   "clicks": args.clicks,
                   "model": args.ckpt or f"{args.config} overfit "
                   f"{args.train_steps} steps on the eval scenes"},
        "geometry_surrogates": surro,
        "miou_per_click": miou,
        # Paired per-instance deltas with bootstrap 95% CIs: the decision
        # criterion is "CI includes 0 or |mean| < 0.01" per click.
        "paired_delta_vs_base": {
            name: paired_delta_ci(vals, base)
            for name, vals in per_instance.items() if name != base_name
        },
    }
    print(json.dumps(report, indent=2))

    # markdown table for PARITY.md
    print("\n| variant | " + " | ".join(
        f"mIoU@{k+1}" for k in range(args.clicks)) + " | paired delta@last [95% CI] |")
    print("|---|" + "---|" * (args.clicks + 1))
    for name, vals in miou.items():
        if name == base_name:
            delta = "—"
        else:
            d = report["paired_delta_vs_base"][name]
            delta = (f"{d['mean'][-1]:+.4f} "
                     f"[{d['ci95'][-1][0]:+.4f}, {d['ci95'][-1][1]:+.4f}]")
        print(f"| {name} | " + " | ".join(f"{v:.4f}" for v in vals)
              + f" | {delta} |")
    return report


if __name__ == "__main__":
    main()
