"""Model stack: point-patch ViT encoder, prompt encoders, two-way decoder,
and the top-level PointCloudSAM (SURVEY.md §2.2 L2)."""

from .decoder_variants import (
    PatchDropout,
    Propagate,
    PropagateAttn,
    PropagateNN,
)
from .loss import (
    compute_iou,
    compute_jaccard,
    compute_mask_loss,
    criterion,
    dice_loss,
    sigmoid_focal_loss,
)
from .mask_decoder import MaskDecoder
from .patch_encoder import PatchEncoder, PatchEncoderNN
from .pc_encoder import (
    PatchEmbed,
    PatchEmbedHier,
    PatchEmbedNN,
    PointCloudEncoder,
)
from .pc_sam import (PointCloudSAM, PointSAMConfig,
                     cast_params_for_inference, for_inference,
                     for_sharded_eval,
                     init_variables)
from .pc_sam_variants import (
    HierConfig,
    MaskDecoderHier,
    PointCloudSAMHier,
    PointCloudSAMNN,
    VoronoiConfig,
)
from .prompt_encoder import (
    MaskEncoder,
    MaskEncoderHier,
    MaskEncoderNN,
    PointEncoder,
    PositionEmbeddingRandom,
)
from .tokenizer import (
    HierTokenizerConfig,
    TokenizerConfig,
    compute_geometry,
    compute_geometry_hier,
    compute_geometry_voronoi,
)
from .transformer import Attention, TwoWayAttentionBlock, TwoWayTransformer
from .vit import VIT_PRESETS, EvaBlock, ViT, ViTConfig, get_vit_config

__all__ = [
    "PatchDropout",
    "Propagate",
    "PropagateAttn",
    "PropagateNN",
    "compute_iou",
    "compute_jaccard",
    "compute_mask_loss",
    "criterion",
    "dice_loss",
    "sigmoid_focal_loss",
    "MaskDecoder",
    "PatchEncoder",
    "PatchEncoderNN",
    "PatchEmbed",
    "PatchEmbedHier",
    "PatchEmbedNN",
    "PointCloudEncoder",
    "PointCloudSAM",
    "PointSAMConfig",
    "cast_params_for_inference",
    "for_inference",
    "for_sharded_eval",
    "init_variables",
    "HierConfig",
    "MaskDecoderHier",
    "PointCloudSAMHier",
    "PointCloudSAMNN",
    "VoronoiConfig",
    "MaskEncoder",
    "MaskEncoderHier",
    "MaskEncoderNN",
    "PointEncoder",
    "PositionEmbeddingRandom",
    "HierTokenizerConfig",
    "TokenizerConfig",
    "compute_geometry",
    "compute_geometry_hier",
    "compute_geometry_voronoi",
    "Attention",
    "TwoWayAttentionBlock",
    "TwoWayTransformer",
    "VIT_PRESETS",
    "EvaBlock",
    "ViT",
    "ViTConfig",
    "get_vit_config",
]
