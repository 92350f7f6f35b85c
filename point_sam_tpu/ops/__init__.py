"""Geometry kernel library (the torkit3d replacement; SURVEY.md §2.1).

All ops are fixed-shape, padding-aware, and jit-safe. Distances throughout
are squared Euclidean (see ops.distance).
"""

from .distance import sq_dist, sq_dist_to_point
from .fps import (
    fps,
    fps_gather,
    fps_with_interp,
    fps_with_interp_knn,
    fps_xla,
)
from .group import (
    batch_index_select,
    group_features,
    group_points,
    group_voronoi,
    repeat_interleave,
)
from .interp import (
    compute_interp_weights,
    interpolate_features,
    interpolate_features_repeated,
)
from .knn import knn, nn1
from .sampler import (
    min_sq_dist_to_complement,
    sample_prompts,
    sample_prompts_random,
)
from .scatter import gather_segments, scatter_max

__all__ = [
    "sq_dist",
    "sq_dist_to_point",
    "fps",
    "fps_gather",
    "fps_with_interp",
    "fps_with_interp_knn",
    "fps_xla",
    "batch_index_select",
    "group_features",
    "group_points",
    "group_voronoi",
    "repeat_interleave",
    "compute_interp_weights",
    "interpolate_features",
    "interpolate_features_repeated",
    "knn",
    "nn1",
    "min_sq_dist_to_complement",
    "sample_prompts",
    "sample_prompts_random",
    "gather_segments",
    "scatter_max",
]
