"""One-shot "bring your own point cloud" inference entry point.

Equivalent of the reference's evaluation/inference.py (the documented BYO
entry, README.md:73): load config + checkpoint, normalize a point cloud
into the unit sphere, run the eval click-simulation loop against provided
ground-truth masks, print per-click IoU. Input is a .ply (+ optional
``.masks.npy``) or an .npz with coords/features/gt_masks arrays.
"""

from __future__ import annotations

import argparse

import numpy as np


def run_inference(model, variables, coords, features, gt_masks,
                  num_clicks: int = 3):
    """Normalized inputs -> per-click IoUs [M, num_clicks]."""
    from .eval_interactive import InteractiveEvaluator

    ev = InteractiveEvaluator(model, variables, num_clicks=num_clicks)
    return ev.evaluate_scene(coords, features, gt_masks)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="large")
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--input", required=True,
                        help=".ply (+.masks.npy) or .npz with coords/"
                             "features/gt_masks")
    parser.add_argument("--num_clicks", type=int, default=3)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    import jax

    from ..models import init_variables
    from ..utils.config import build_model, load_config
    from .eval_interactive import filter_masks, normalize_scene

    cfg = load_config(args.config, args.overrides)
    model = build_model(cfg.model)
    variables = init_variables(model, jax.random.PRNGKey(0))
    if args.ckpt_path:
        from ..utils.checkpoint import load_variables

        variables = load_variables(args.ckpt_path, variables)

    if args.input.endswith(".npz"):
        data = np.load(args.input)
        xyz, rgb, gt = data["coords"], data["features"], data["gt_masks"]
    else:
        from pathlib import Path

        from ..utils.ply import load_ply

        xyz, rgb = load_ply(args.input)
        gt = np.load(Path(args.input).with_suffix(".masks.npy"))

    keep = filter_masks(gt)
    gt = gt[keep]
    xyz, rgb = normalize_scene(xyz, rgb)
    ious = run_inference(model, variables, xyz, rgb, gt,
                         num_clicks=args.num_clicks)
    for k in range(args.num_clicks):
        print(f"mean IoU @ click {k + 1}: {ious[:, k].mean():.4f}")
    return ious


if __name__ == "__main__":
    main()
