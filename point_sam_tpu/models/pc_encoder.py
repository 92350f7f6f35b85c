"""Point-cloud ViT encoder (Flax linen).

Equivalent of the reference's ``PointCloudEncoder`` (pc_encoder.py:84-145):
patch embed (grouping + PointNet) -> linear projection to the transformer
width -> MLP positional embedding of the patch centers -> ViT blocks ->
final norm -> output projection to the decoder width (256).

Grouping *geometry* (FPS/kNN indices) is precomputed by models.tokenizer and
passed in, so the encoder modules are pure parametric functions — this is
what lets serving cache geometry per cloud and lets the eval pipeline keep
shapes static across scenes.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import group_points, group_voronoi
from .layers import CoordMLP, LayerNorm
from .patch_encoder import PatchEncoder, PatchEncoderNN
from .tokenizer import HierTokenizerConfig, TokenizerConfig
from .vit import ViT, ViTConfig

Dtype = Any


class PatchEmbed(nn.Module):
    """KNN grouping + PointNet encoding (reference: pc_encoder.py:13-41)."""

    cfg: TokenizerConfig
    out_channels: int = 512
    hidden_dims: Sequence[int] = (128, 512)
    dtype: Dtype = jnp.float32
    act: str = "erf"

    @nn.compact
    def __call__(self, coords, features, geom: dict) -> jnp.ndarray:
        group_feats = group_points(
            coords,
            features,
            geom["centers"],
            geom["knn_idx"],
            radius=self.cfg.radius,
            centralize_features=self.cfg.centralize_features,
            center_idx=geom["fps_idx"] if self.cfg.centralize_features else None,
        )  # [B, G, K, 3 + C]
        return PatchEncoder(
            self.out_channels, self.hidden_dims, dtype=self.dtype,
            act=self.act, name="patch_encoder",
        )(group_feats)


class PatchEmbedNN(nn.Module):
    """Voronoi tokenizer: per-point MLP blocks + scatter-max onto centers
    (reference: pc_encoder.py:148-198)."""

    num_patches: int
    hidden_dim: int = 256
    out_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, features, geom: dict) -> jnp.ndarray:
        feats = group_voronoi(
            coords, features, geom["centers"], geom["nn_idx"]
        )  # [B, N, 3+1+C]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="in_proj")(feats.astype(self.dtype))
        for i in range(3):
            x = _PreLNBlock(self.hidden_dim, dtype=self.dtype,
                            name=f"blocks1_{i}")(x)
        from ..ops import scatter_max

        # Padded points must never win the per-cell max.
        if geom.get("point_valid") is not None:
            x = jnp.where(geom["point_valid"][..., None], x, -jnp.inf)
        y = scatter_max(x, geom["nn_idx"], self.num_patches)
        for i in range(3):
            y = _PreLNBlock(self.hidden_dim, dtype=self.dtype,
                            name=f"blocks2_{i}")(y)
        y = LayerNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(y)


class _PreLNBlock(nn.Module):
    """x + MLP(LN(x)) residual block (reference: pc_encoder.py:148-162)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(dtype=self.dtype, name="norm")(x)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = LayerNorm(dtype=self.dtype, name="mid_norm")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(h)
        return x + h


class PatchEmbedHier(nn.Module):
    """PointNet++-style two-level patch embed (reference: pc_encoder.py:201-239).

    Level 1: group the cloud into G1 patches, encode to 128-d.
    Level 2: group the G1 centers (first G2 as centers), encode 128+3 -> out.
    Returns (embeddings_l1 [B,G1,128], embeddings_l2 [B,G2,out]).
    """

    cfg: HierTokenizerConfig
    out_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords, features, geom: dict):
        r = self.cfg.radius
        g1 = group_points(
            coords, features, geom["centers1"], geom["knn_idx1"],
            radius=r[0] if r else None,
        )
        x1 = PatchEncoder(128, (64, 128), dtype=self.dtype,
                          name="patch_encoder1")(g1)
        g2 = group_points(
            geom["centers1"], x1, geom["centers2"], geom["knn_idx2"],
            radius=r[1] if r else None,
        )
        x2 = PatchEncoder(self.out_channels, (128, 256), dtype=self.dtype,
                          name="patch_encoder2")(g2)
        return x1, x2


class PointCloudEncoder(nn.Module):
    """Patch embed -> ViT -> per-patch embeddings [B, G, embed_dim]
    (reference: pc_encoder.py:84-145)."""

    vit_cfg: ViTConfig
    embed_dim: int = 256  # decoder-facing width (reference out_proj, :116)
    patch_embed_channels: int = 512
    dtype: Dtype = jnp.float32
    # Block rematerialization. Required for ViT-L TRAINING memory; for
    # inference-only programs it is pure compile-time cost — the composed
    # remat+scan ViT inside the full encode graph wedges the remote XLA
    # compile service (r2 finding), while remat=False compiles in seconds.
    # The trainer keeps True; eval/serving/bench build with False.
    vit_remat: bool = True

    def setup(self):
        self.patch_proj = nn.Dense(
            self.vit_cfg.embed_dim, dtype=self.dtype, param_dtype=jnp.float32
        )
        self.pos_embed = CoordMLP(128, self.vit_cfg.embed_dim, dtype=self.dtype)
        self.transformer = ViT(self.vit_cfg, dtype=self.dtype,
                               remat=self.vit_remat)
        self.out_proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32
        )

    def __call__(self, patch_embeddings, centers, *, deterministic=True):
        """Args:
            patch_embeddings: [B, G, patch_embed_channels] from a PatchEmbed*.
            centers: [B, G, 3] patch centers (positional embedding input).
        """
        x = self.patch_proj(patch_embeddings.astype(self.dtype))
        x = x + self.pos_embed(centers)
        x = self.transformer(x, deterministic=deterministic)
        return self.out_proj(x)
