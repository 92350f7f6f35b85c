"""Evaluator works across model variants (knn override / voronoi / hier)."""

import numpy as np
import jax
import pytest

from point_sam_tpu.evalsuite.eval_interactive import (
    InteractiveEvaluator,
    filter_masks,
    normalize_scene,
)
from point_sam_tpu.models import (
    HierConfig,
    PointCloudSAMHier,
    PointCloudSAMNN,
    VoronoiConfig,
    init_variables,
)
from point_sam_tpu.models.tokenizer import HierTokenizerConfig


def synth_scene(n=1200):
    from point_sam_tpu.datasets.synthetic import generate_scene

    ex = generate_scene(11, num_points=n)
    xyz, rgb = normalize_scene(ex["coords"], ex["features"])
    gt = ex["gt_masks"][filter_masks(ex["gt_masks"])]
    return xyz, rgb, gt


@pytest.mark.parametrize("make_model", [
    lambda: PointCloudSAMNN(VoronoiConfig(vit="tiny", num_patches=32,
                                          hidden_dim=32, prompt_iters=2)),
    lambda: PointCloudSAMHier(HierConfig(
        vit="tiny", tokenizer=HierTokenizerConfig((64, 16), (8, 4)),
        prompt_iters=2)),
])
def test_variant_eval(make_model):
    model = make_model()
    variables = init_variables(model, jax.random.PRNGKey(0))
    xyz, rgb, gt = synth_scene()
    ev = InteractiveEvaluator(model, variables, num_clicks=2,
                              point_buckets=(2048,), masks_per_batch=2)
    ious = ev.evaluate_scene(xyz, rgb, gt)
    assert ious.shape == (len(gt), 2)
    assert np.isfinite(ious).all()
