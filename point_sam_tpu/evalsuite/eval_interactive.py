"""Interactive-segmentation evaluation: mean IoU per click count.

Equivalent of the reference's ``evaluation/eval_kitti.py`` (KITTI-360 crops
from the AGILE3D eval data; SURVEY.md §3.2): per scene, normalize into the
unit sphere, take one sample per GT instance (filtered to
``sum >= min_mask_points`` and ``< max_mask_fraction * N``,
eval_kitti.py:249-255), run the full click-simulation loop with
``is_eval=True`` semantics (a farthest-from-error-border click every
iteration), and report mean IoU at click k plus per-category means
(eval_kitti.py:374-390).

TPU-first difference: instead of reconfiguring the grouper per scene
(eval_kitti.py:350-362), scenes are padded into N-size buckets with
validity masks, so each (bucket, G, K) compiles once and every scene reuses
a cached executable. The same tokenizer rule is applied at bucket level:
N > 30000 -> G=2048/K=256, else G=min(2048, next_pow2(N)) (README.md:69).
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def filter_masks(
    gt_masks: np.ndarray,
    min_points: int = 25,
    max_fraction: float = 0.9,
) -> np.ndarray:
    """Instance filter of eval_kitti.py:249-255. Returns kept row indices."""
    n = gt_masks.shape[1]
    sizes = gt_masks.sum(1)
    keep = (sizes >= min_points) & (sizes < max_fraction * n)
    return np.nonzero(keep)[0]


def normalize_scene(xyz: np.ndarray, rgb: np.ndarray | None):
    """Unit-sphere + color normalization (eval_kitti.py:73-88,101-102)."""
    shift = xyz.mean(0)
    xyz = xyz - shift
    scale = np.linalg.norm(xyz, axis=1).max()
    xyz = xyz / max(scale, 1e-12)
    if rgb is None:
        rgb = np.full((len(xyz), 3), 0.5, np.float32)
    else:
        rgb = np.asarray(rgb, np.float32)
        if rgb.max() > 1.5:  # 0..255 -> normalized
            rgb = rgb / 255.0
        rgb = (rgb - 0.5) / 0.5
    return xyz.astype(np.float32), rgb


class InteractiveEvaluator:
    """Bucketed click-simulation evaluator over a PointCloudSAM model."""

    def __init__(self, model, variables, *, num_clicks: int = 5,
                 point_buckets=(8192, 32768, 131072, 262144),
                 masks_per_batch: int = 4, knn_method: str = "auto",
                 gk_policy: str = "bucket_pow2", mesh=None,
                 fps_candidates: int | None = None,
                 knn_recall_target: float = 0.9):
        """Args beyond the obvious:

        knn_method: "auto" (TPU approx_min_k for big clouds — default) or
            "exact" — the A/B switch for measuring the approximation's mIoU
            cost (see evalsuite/ab_approx.py; defaults justified there).
        fps_candidates: optional approximate-FPS switch (ops.fps
            ``candidates``): centers are sampled from a strided subset of
            this many points. None = exact FPS (reference parity); the
            A/B lives in evalsuite/ab_approx.py.
        knn_recall_target: recall target for the approx kNN path (the
            third A/B knob; see TokenizerConfig.knn_recall_target).
        gk_policy: tokenizer reconfiguration rule.
            - "bucket_pow2" (default): G rounded to the next power of two
              and K scaled down for tiny scenes — every scene in an N-bucket
              shares ONE compiled executable (the TPU-first policy).
            - "reference": the reference's exact per-scene rule
              (eval_kitti.py:350-362): N>30000 -> G=2048/K=256, else
              G=min(N, 2048), K=256 (K=2 when N<256). Faithful, but each
              distinct N compiles its own executable.
        mesh: optional multi-device jax.sharding.Mesh; scenes larger than
            ``point_buckets[-1]`` then run their kNN with the point axis
            sharded over the mesh (parallel.sharded_geometry) instead of
            single-device.
        """
        assert gk_policy in ("bucket_pow2", "reference"), gk_policy
        from ..models import for_inference

        self.model = for_inference(model)
        self.variables = variables
        self.num_clicks = num_clicks
        self.point_buckets = tuple(point_buckets)
        self.masks_per_batch = masks_per_batch
        self.knn_method = knn_method
        self.gk_policy = gk_policy
        self.mesh = mesh
        self.fps_candidates = fps_candidates
        self.knn_recall_target = knn_recall_target
        self._fns = {}

    def _bucket(self, n):
        for b in self.point_buckets:
            if n <= b:
                return b
        return int(-(-n // self.point_buckets[-1]) * self.point_buckets[-1])

    def _tokenizer_for(self, n):
        from ..models.tokenizer import TokenizerConfig

        tok = getattr(self.model.cfg, "tokenizer", None)
        if tok is None or isinstance(tok.num_patches, (tuple, list)):
            # voronoi (no flat tokenizer) / hier (two-level): model default.
            return None
        kw = dict(radius=tok.radius,
                  centralize_features=tok.centralize_features,
                  knn_method=self.knn_method,
                  fps_candidates=self.fps_candidates,
                  knn_recall_target=self.knn_recall_target)
        if self.gk_policy == "reference":
            # eval_kitti.py:350-362 verbatim: per-scene G, fixed K=256.
            if n > 30000:
                return TokenizerConfig(2048, 256, **kw)
            return TokenizerConfig(min(n, 2048), 2 if n < 256 else 256, **kw)
        if n > 30000:
            return TokenizerConfig(2048, 256, **kw)
        g = 64
        while g < min(2048, n):
            g *= 2
        k = min(tok.patch_size, max(2, n // 4))
        return TokenizerConfig(min(g, tok.num_patches * 2), k, **kw)

    def _sharded_geometry(self, tok):
        """Tokenizer geometry with the cloud's point axis sharded over the
        mesh: the G x K neighbor search (the O(G*N) stage) runs per-shard
        with one small all-gather merge (parallel.sharded_geometry). FPS
        stays replicated (globally sequential); 3-NN interp keys are the G
        centers (small, replicated)."""
        import jax
        import jax.numpy as jnp

        from ..ops import batch_index_select, compute_interp_weights, fps
        from ..parallel.sharded_geometry import sharded_knn

        mesh = self.mesh

        def geometry(coords, point_valid):
            coords = jax.lax.stop_gradient(coords.astype(jnp.float32))
            fps_idx = fps(coords, tok.num_patches, valid=point_valid,
                          candidates=tok.fps_candidates)
            centers = batch_index_select(coords, fps_idx, axis=1)
            _, knn_idx = sharded_knn(
                centers, coords, tok.patch_size, mesh,
                method=tok.knn_method,
                recall_target=tok.knn_recall_target,
                key_valid=point_valid,
            )
            idx, w = compute_interp_weights(coords, centers)
            return dict(fps_idx=fps_idx, centers=centers, knn_idx=knn_idx,
                        interp_index=idx, interp_weight=w)

        return geometry

    def _use_sharded(self, n_pad, tok):
        return (
            self.mesh is not None
            and self.mesh.size > 1
            and tok is not None
            and n_pad >= self.point_buckets[-1]
            and type(self.model).__name__ == "PointCloudSAM"
        )

    def _build_fn(self, n_pad, tok, m):
        import jax
        import jax.numpy as jnp

        from ..models import compute_iou
        from ..ops import batch_index_select, sample_prompts

        model = self.model
        clicks = self.num_clicks
        geometry_fn = (
            self._sharded_geometry(tok) if self._use_sharded(n_pad, tok)
            else None
        )
        if geometry_fn is not None:
            # Big-scene bucket: also shard the decoder's N-point upscale +
            # hypernet matmul over the mesh (models.for_sharded_eval) —
            # same mesh axis as the sharded kNN above.
            from ..models import for_sharded_eval

            model = for_sharded_eval(self.model, self.mesh)

        @jax.jit
        def run(variables, coords, feats, valid, gt_masks):
            if geometry_fn is not None:
                geom = geometry_fn(coords, valid)
            else:
                geom = model.make_geometry(coords, point_valid=valid,
                                           tokenizer=tok)
            emb, pc_pe, *extras = model.apply(
                variables, coords, feats, geom, method=model.encode
            )
            if type(model).__name__ == "PointCloudSAM":
                # Cache the click-invariant half of the mask-prompt grouping
                # once per scene; the clicks-1 mask-conditioned decodes below
                # then gather only the logit channel (prompt_encoder.
                # mask_group_rel_xyz). Flagship MaskEncoder has radius=None.
                from ..models.prompt_encoder import mask_group_rel_xyz

                geom = dict(geom)
                geom["mask_rel_xyz"] = mask_group_rel_xyz(
                    coords, geom["centers"], geom["knn_idx"]
                )
            B, M, N = gt_masks.shape
            BM = B * M
            buf_c = jnp.zeros((BM, clicks, 3), jnp.float32)
            buf_l = jnp.zeros((BM, clicks), bool)
            buf_v = jnp.zeros((BM, clicks), bool)
            prompt_masks = None
            ious = []
            gt_flat = gt_masks.reshape(BM, N)
            for i in range(clicks):
                pc, pl = sample_prompts(
                    coords, gt_masks, prompt_masks, point_valid=valid
                )
                buf_c = buf_c.at[:, i].set(pc[:, 0])
                buf_l = buf_l.at[:, i].set(pl[:, 0])
                buf_v = buf_v.at[:, i].set(True)
                masks, iou_preds = model.apply(
                    variables, emb, pc_pe, coords, geom, *extras,
                    buf_c[:, : i + 1], buf_l[:, : i + 1], prompt_masks,
                    prompt_valid=buf_v[:, : i + 1],
                    multimask_output=(i == 0),
                    method=model.decode,
                )
                if i == 0:
                    best_ind = jnp.argmax(iou_preds, axis=1)
                    prompt_masks = batch_index_select(masks, best_ind, axis=1)
                else:
                    prompt_masks = masks[:, 0]
                pm = jnp.where(valid.repeat(M, axis=0), prompt_masks, -1e9)
                ious.append(compute_iou(pm, gt_flat))
            return jnp.stack(ious, 0)  # [clicks, B*M]

        return run

    def evaluate_scene(self, xyz, rgb, gt_masks, categories=None):
        """Run the click loop for every instance of one (normalized) scene.

        Returns dict: per-instance IoU-per-click [num_instances, clicks].
        """
        import jax.numpy as jnp

        n = len(xyz)
        n_pad = self._bucket(n)
        tok = self._tokenizer_for(n)
        m_all = len(gt_masks)

        coords = np.zeros((1, n_pad, 3), np.float32)
        coords[0, :n] = xyz
        feats = np.zeros((1, n_pad, rgb.shape[-1]), np.float32)
        feats[0, :n] = rgb
        valid = np.zeros((1, n_pad), bool)
        valid[0, :n] = True

        tok_key = (tok.num_patches, tok.patch_size) if tok else "model"
        key = (n_pad, tok_key, self.masks_per_batch)
        if key not in self._fns:
            self._fns[key] = self._build_fn(n_pad, tok, self.masks_per_batch)
        run = self._fns[key]

        # Batch instances in chunks of masks_per_batch (padded by repeating
        # the first mask; padded rows are discarded).
        out = np.zeros((m_all, self.num_clicks), np.float32)
        mb = self.masks_per_batch
        for s in range(0, m_all, mb):
            chunk = gt_masks[s : s + mb]
            real = len(chunk)
            if real < mb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:1], mb - real, axis=0)]
                )
            gm = np.zeros((1, mb, n_pad), bool)
            gm[0, :, :n] = chunk
            # Padded rows duplicate mask 0 (fixed shapes; results dropped).
            ious = np.asarray(
                run(self.variables, jnp.asarray(coords), jnp.asarray(feats),
                    jnp.asarray(valid), jnp.asarray(gm))
            )  # [clicks, mb]
            out[s : s + real] = ious[:, :real].T
        return out


def evaluate_directory(
    model, variables, scene_dir: str, *, num_clicks: int = 5,
    max_scenes: int | None = None, category_from_name=None,
    **evaluator_kwargs,
):
    """Evaluate every .ply scene in a directory, KITTI-360 protocol.

    Scene format: binary/ascii PLY with optional per-vertex colors plus a
    sidecar ``<name>.masks.npy`` bool array [M, N] of instance masks (the
    AGILE3D crops ship instance ids; the converter in
    evalsuite/prepare_kitti.py produces this layout).

    ``evaluator_kwargs`` pass through to ``InteractiveEvaluator`` —
    gk_policy / knn_method / knn_recall_target / fps_candidates /
    masks_per_batch — so the reference-faithful tokenizer policy
    (eval_kitti.py:350-362) and the approximation A/B knobs are reachable
    from the CLI.
    """
    from ..utils.ply import load_ply

    evaluator = InteractiveEvaluator(model, variables,
                                     num_clicks=num_clicks,
                                     **evaluator_kwargs)
    per_click = defaultdict(list)
    per_cat = defaultdict(lambda: defaultdict(list))

    scenes = sorted(Path(scene_dir).glob("*.ply"))
    if max_scenes:
        scenes = scenes[:max_scenes]
    for scene in scenes:
        xyz, rgb = load_ply(scene)
        mask_file = scene.with_suffix(".masks.npy")
        if not mask_file.exists():
            print(f"skip {scene.name}: no {mask_file.name}")
            continue
        gt = np.load(mask_file)
        keep = filter_masks(gt)
        if len(keep) == 0:
            continue
        gt = gt[keep]
        xyz_n, rgb_n = normalize_scene(xyz, rgb)
        ious = evaluator.evaluate_scene(xyz_n, rgb_n, gt)
        cat = category_from_name(scene.name) if category_from_name else "all"
        for k in range(num_clicks):
            per_click[k].extend(ious[:, k].tolist())
            per_cat[cat][k].extend(ious[:, k].tolist())
        print(f"{scene.name}: {len(gt)} instances, "
              + " ".join(f"IoU@{k+1}={np.mean(ious[:, k]):.3f}"
                         for k in range(num_clicks)))

    report = {
        "mean_iou_per_click": {
            k + 1: float(np.mean(v)) for k, v in sorted(per_click.items())
        },
        "per_category": {
            c: {k + 1: float(np.mean(v)) for k, v in sorted(d.items())}
            for c, d in per_cat.items()
        },
        "num_instances": len(per_click[0]) if per_click else 0,
    }
    return report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="large")
    parser.add_argument("--ckpt_path", default=None,
                        help="orbax checkpoint dir or torch safetensors file")
    parser.add_argument("--scene_dir", required=True)
    parser.add_argument("--num_clicks", type=int, default=5)
    parser.add_argument("--max_scenes", type=int, default=None)
    parser.add_argument(
        "--category_from", default="filename-prefix",
        choices=["filename-prefix", "none"],
        help="how to derive the per-category mIoU table (reference prints "
        "total AND per-object-category means, eval_kitti.py:374-390). "
        "filename-prefix uses name.split('_')[0], the layout produced by "
        "prepare_kitti.py; none reports a single 'all' bucket.")
    parser.add_argument(
        "--gk-policy", default="bucket_pow2",
        choices=["bucket_pow2", "reference"],
        help="tokenizer reconfiguration rule: bucket_pow2 = one executable "
        "per N-bucket (TPU-first); reference = the per-scene rule of "
        "eval_kitti.py:350-362 (faithful, recompiles per distinct N)")
    parser.add_argument(
        "--knn-method", default="auto", choices=["auto", "exact", "approx"],
        help="tokenizer G x K neighbor search: auto = approx_min_k on TPU "
        "for big clouds; exact = blocked exact scan (the A/B switch)")
    parser.add_argument(
        "--recall-target", type=float, default=0.9,
        help="per-neighbor recall target for the approx kNN path")
    parser.add_argument(
        "--fps-candidates", type=int, default=None,
        help="approximate FPS: sample centers from a strided subset of "
        "this many points (default: exact FPS, reference parity)")
    parser.add_argument(
        "--masks-per-batch", type=int, default=4,
        help="instances decoded per compiled batch (padded; fixed shapes)")
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    import jax

    from ..models import init_variables
    from ..utils.config import build_model, load_config

    cfg = load_config(args.config, args.overrides)
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.PRNGKey(0))
    if args.ckpt_path:
        from ..utils.checkpoint import load_variables

        variables = load_variables(args.ckpt_path, variables)

    category_from_name = (
        (lambda n: n.split("_")[0])
        if args.category_from == "filename-prefix" else None
    )
    report = evaluate_directory(
        model, variables, args.scene_dir,
        num_clicks=args.num_clicks, max_scenes=args.max_scenes,
        category_from_name=category_from_name,
        gk_policy=args.gk_policy, knn_method=args.knn_method,
        knn_recall_target=args.recall_target,
        fps_candidates=args.fps_candidates,
        masks_per_batch=args.masks_per_batch,
    )
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
