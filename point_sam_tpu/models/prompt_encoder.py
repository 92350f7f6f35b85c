"""Prompt encoders: click (sparse) and mask (dense) prompts (Flax linen).

Equivalents of the reference's prompt_encoder.py:
- ``PositionEmbeddingRandom`` (random-Fourier PE, :13-48): the gaussian
  frequency matrix is a *buffer*, not a parameter — stored here in the
  ``buffers`` variable collection so the optimizer never touches it.
- ``PointEncoder`` (:51-77): PE of click coords + learned pos/neg embedding.
- ``MaskEncoder`` (:80-133): previous mask logits regrouped onto the
  encoder's centers/knn_idx and PointNet-encoded to dense embeddings; a
  learned ``no_mask_embed`` when there is no mask prompt.

Fixed-shape note: invalid (padded) click slots are encoded like real ones;
downstream attention masks (models.transformer) neutralize them. The
no-mask case is handled with a static flag (first click iteration), never a
traced branch.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    batch_index_select,
    group_features,
    group_points,
    repeat_interleave,
    scatter_max,
)
from .patch_encoder import PatchEncoder

Dtype = Any


class PositionEmbeddingRandom(nn.Module):
    """Random spatial-frequency positional encoding for [-1, 1] coords."""

    num_pos_feats: int = 128  # embed_dim // 2
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords [..., 3] in [-1, 1] -> [..., 2 * num_pos_feats]."""
        mat = self.variable(
            "buffers",
            "gaussian_matrix",
            lambda: self.scale
            * jax.random.normal(
                self.make_rng("params"), (3, self.num_pos_feats), jnp.float32
            ),
        ).value
        # fp32 throughout: sin/cos of large arguments is precision-sensitive.
        x = coords.astype(jnp.float32) @ mat
        x = 2.0 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class PointEncoder(nn.Module):
    """Click prompt encoder (reference prompt_encoder.py:51-77)."""

    embed_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # point_embeddings[0] = negative, [1] = positive (reference :75-76).
        self.label_embed = self.param(
            "label_embed",
            nn.initializers.normal(1.0),
            (2, self.embed_dim),
            jnp.float32,
        )

    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """points [..., P, 3], labels [..., P] bool/int -> [..., P, D]."""
        pe = self.pe_layer(points)
        lab = jnp.where(
            labels[..., None] > 0, self.label_embed[1], self.label_embed[0]
        )
        return (pe + lab).astype(self.dtype)


class MaskEncoder(nn.Module):
    """Mask prompt encoder (reference prompt_encoder.py:80-133)."""

    embed_dim: int = 256
    hidden_dims: Sequence[int] = (128, 512)
    radius: float | None = None
    dtype: Dtype = jnp.float32
    act: str = "erf"

    def setup(self):
        self.patch_encoder = PatchEncoder(
            self.embed_dim, self.hidden_dims, dtype=self.dtype, act=self.act
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,),
            jnp.float32,
        )

    def __call__(
        self,
        masks: jnp.ndarray | None,
        coords: jnp.ndarray,
        centers: jnp.ndarray,
        knn_idx: jnp.ndarray,
        rel_xyz: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """masks [B*M, N] logits (or None), coords [B, N, 3], centers [B, L, 3],
        knn_idx [B, L, K] -> dense embeddings [B*M or B, L, D].

        rel_xyz: optional cached [B, L, K, 3] grouped relative coordinates
        from ``mask_group_rel_xyz`` — they are click-iteration-invariant
        (the reference regroups them every refinement pass,
        prompt_encoder.py:114-121), so callers that decode repeatedly against
        one geometry (the training click loop, the serving predictor) compute
        them once and each iteration gathers only the 1 logit channel.
        Bit-identical output either way.
        """
        if masks is None:
            B, L = centers.shape[:2]
            return jnp.broadcast_to(
                self.no_mask_embed.astype(self.dtype), (B, L, self.embed_dim)
            )
        masks = jax.lax.stop_gradient(masks)  # reference detaches (:122)
        if rel_xyz is None:
            patches = group_points(
                coords, masks[..., None], centers, knn_idx, radius=self.radius
            )  # [B*M, L, K, 4]
        else:
            logit = group_features(masks[..., None], knn_idx)  # [B*M, L, K, 1]
            nbr = repeat_interleave(
                rel_xyz, masks.shape[0] // coords.shape[0], axis=0
            )
            patches = jnp.concatenate([nbr, logit.astype(nbr.dtype)], axis=-1)
        return self.patch_encoder(patches)


def mask_group_rel_xyz(coords, centers, knn_idx, radius=None):
    """Click-iteration-invariant half of the mask-prompt grouping: the
    (radius-normalized) relative coordinates of each center's K neighbors,
    [B, L, K, 3]. Parameter-free; computed identically to group_points'
    xyz branch so cached and uncached MaskEncoder outputs are bit-equal."""
    nbr = batch_index_select(coords, knn_idx, axis=1) - centers[:, :, None, :]
    if radius is not None:
        nbr = nbr / radius
    return nbr


class MaskEncoderHier(nn.Module):
    """Two-level mask prompt encoder (reference prompt_encoder.py:136-183)."""

    embed_dim: int = 256
    radius: tuple[float, float] | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.patch_encoder1 = PatchEncoder(128, (64, 128), dtype=self.dtype)
        self.patch_encoder2 = PatchEncoder(
            self.embed_dim, (128, 256), dtype=self.dtype
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,),
            jnp.float32,
        )

    def __call__(self, masks, coords, centers1, knn_idx1, centers2, knn_idx2,
                 rel_xyz1=None, rel_xyz2=None):
        """rel_xyz1/rel_xyz2: optional cached [B, G_l, K_l, 3] grouped
        relative coordinates per level (``mask_group_rel_xyz``) — both are
        click-iteration-invariant (the reference regroups them every
        refinement pass, prompt_encoder.py:158-176), so repeated decodes
        against one geometry gather only the mask-dependent channels.
        Bit-identical output either way."""
        if masks is None:
            B, L = centers2.shape[:2]
            return None, jnp.broadcast_to(
                self.no_mask_embed.astype(self.dtype), (B, L, self.embed_dim)
            )
        masks = jax.lax.stop_gradient(masks)
        r = self.radius
        if rel_xyz1 is None:
            p1 = group_points(
                coords, masks[..., None], centers1, knn_idx1,
                radius=r[0] if r else None,
            )
        else:
            logit = group_features(masks[..., None], knn_idx1)
            nbr = repeat_interleave(
                rel_xyz1, masks.shape[0] // coords.shape[0], axis=0
            )
            p1 = jnp.concatenate([nbr, logit.astype(nbr.dtype)], axis=-1)
        x1 = self.patch_encoder1(p1)  # [B*M, G1, 128]
        if rel_xyz2 is None:
            p2 = group_points(
                centers1, x1, centers2, knn_idx2, radius=r[1] if r else None
            )
        else:
            feats = group_features(x1, knn_idx2)  # [B*M, G2, K2, 128]
            nbr2 = repeat_interleave(
                rel_xyz2, x1.shape[0] // centers1.shape[0], axis=0
            )
            # concat in the rel-xyz dtype (fp32): group_points' concat
            # promotes [nbr_xyz f32 | feats] the same way — bit-equal.
            p2 = jnp.concatenate(
                [nbr2, feats.astype(nbr2.dtype)], axis=-1
            )
        x2 = self.patch_encoder2(p2)  # [B*M, G2, D]
        return x1, x2


def mask_nbr_dist(coords, centers, nn_idx):
    """Click-iteration-invariant half of the voronoi mask-prompt features:
    per-point offset to the assigned center and its norm
    ([B, N, 3], [B, N, 1]). Parameter-free; computed identically to
    MaskEncoderNN's inline branch so cached and uncached outputs are
    bit-equal."""
    nbr = coords - batch_index_select(centers, nn_idx, axis=1)
    dist = jnp.linalg.norm(nbr, axis=-1, keepdims=True)
    return nbr, dist


class MaskEncoderNN(nn.Module):
    """Voronoi mask prompt encoder (reference prompt_encoder.py:248-300):
    per-point [logit, unit_dir, dist] -> Dense -> segment-max onto centers ->
    residual MLP stack."""

    embed_dim: int = 256
    num_patches: int = 1024
    hidden_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, masks, coords, centers, nn_idx, point_valid=None,
                 nbr_dist=None):
        """masks [B*M, N] logits or None; coords [B, N, 3]; centers [B, L, 3];
        nn_idx [B, N] voronoi assignment; point_valid [B, N] padding mask
        (padded points are excluded from the per-cell max).

        nbr_dist: optional cached (nbr [B, N, 3], dist [B, N, 1]) from
        ``mask_nbr_dist`` — click-iteration-invariant (the reference
        recomputes them every refinement pass, prompt_encoder.py:264-270);
        bit-identical output either way."""
        no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,),
            jnp.float32,
        )
        if masks is None:
            B, L = centers.shape[:2]
            return jnp.broadcast_to(
                no_mask_embed.astype(self.dtype), (B, L, self.embed_dim)
            )
        masks = jax.lax.stop_gradient(masks)
        repeats = masks.shape[0] // coords.shape[0]
        if nbr_dist is None:
            nbr_dist = mask_nbr_dist(coords, centers, nn_idx)
        nbr, dist = nbr_dist
        if repeats > 1:
            nbr = repeat_interleave(nbr, repeats, axis=0)
            dist = repeat_interleave(dist, repeats, axis=0)
            nn_idx = repeat_interleave(nn_idx, repeats, axis=0)
        feats = jnp.concatenate([masks[..., None], nbr, dist], axis=-1)  # [BM,N,5]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="first_nn")(feats.astype(self.dtype))
        if point_valid is not None:
            pv = repeat_interleave(point_valid, x.shape[0] //
                                   point_valid.shape[0], axis=0)
            x = jnp.where(pv[..., None], x, -jnp.inf)
        y = scatter_max(x, nn_idx, self.num_patches)  # [BM, L, hidden]
        # ResMlp (reference prompt_encoder.py:199-211).
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="res_in")(y)
        h = _ln(h, self.dtype, "res_in_norm")
        h = nn.gelu(h, approximate=False)
        for i in range(3):
            r_ = nn.Dense(self.hidden_dim, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"res_{i}")(h)
            r_ = _ln(r_, self.dtype, f"res_{i}_norm")
            h = h + nn.gelu(r_, approximate=False)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_out")(h)


def _ln(x, dtype, name):
    from .layers import LayerNorm

    return LayerNorm(dtype=dtype, name=name)(x)


class PromptEncoderNN(nn.Module):
    """Combined click + voronoi-mask prompt encoder (reference
    prompt_encoder.py:303-354 bundles both for the voronoi model; the
    top-level PointCloudSAMNN here wires them separately, so this wrapper
    exists for API parity with the reference's module surface)."""

    embed_dim: int = 256
    num_patches: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.point_encoder = PointEncoder(self.embed_dim, dtype=self.dtype)
        self.mask_encoder = MaskEncoderNN(
            embed_dim=self.embed_dim, num_patches=self.num_patches,
            dtype=self.dtype,
        )

    def embed_points(self, points, labels):
        return self.point_encoder(points, labels)

    def embed_masks(self, masks, coords, centers, nn_idx):
        return self.mask_encoder(masks, coords, centers, nn_idx)

    def __call__(self, points, labels, masks, coords, centers, nn_idx):
        return (
            self.embed_points(points, labels),
            self.embed_masks(masks, coords, centers, nn_idx),
        )
