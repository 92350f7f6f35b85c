"""Voronoi and hierarchical Point-SAM variants (Flax linen).

Equivalents of the reference's ``PointCloudSAMNN`` (voronoi tokenizer +
scatter-max mask encoder, reference: pc_sam.py:199-374) and
``PointCloudSAMHier`` + ``MaskDecoderHier`` (two-level tokenizer with
two-stage upscaling, reference: pc_sam.py:377-496, mask_decoder.py:214-370).

Shared with the flagship model: the unrolled fixed-shape click loop and the
device-side prompt sampler. Differences faithfully kept:
- The voronoi variant groups per point (1-NN center assignment) instead of
  per patch; its mask encoder is a segment-max PointNet.
- The hier variant upscales decoder tokens in two interpolation hops
  (G2 centers -> G1 centers with a skip-concat of level-1 embeddings, then
  G1 -> N points) and its hypernetworks output transformer_dim/2.
- The hier reference samples clicks *uniformly from the error region*
  (pc_sam.py:434 uses sample_prompts, not the adapter); we keep that.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import interpolate_features_repeated, repeat_interleave
from .layers import MLP, LayerNorm
from .mask_decoder import MaskDecoder
from .pc_sam import _click_loop
from .pc_encoder import PatchEmbedHier, PatchEmbedNN, PointCloudEncoder
from .prompt_encoder import (
    MaskEncoderHier,
    MaskEncoderNN,
    PointEncoder,
    mask_group_rel_xyz,
    mask_nbr_dist,
)
from .tokenizer import (
    HierTokenizerConfig,
    compute_geometry_hier,
    compute_geometry_voronoi,
)
from .transformer import TwoWayTransformer
from .vit import ViTConfig, get_vit_config

Dtype = Any


# ============================================================ voronoi (NN)
@dataclasses.dataclass(frozen=True)
class VoronoiConfig:
    vit: str | ViTConfig = "eva02_large"
    num_patches: int = 1024
    hidden_dim: int = 256  # per-point MLP width of the patch embed
    embed_dim: int = 256
    patch_embed_channels: int = 512
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    prompt_iters: int = 5
    enable_mask_refinement_iterations: bool = True
    vit_remat: bool = True  # see PointSAMConfig.vit_remat

    @property
    def vit_cfg(self) -> ViTConfig:
        return get_vit_config(self.vit) if isinstance(self.vit, str) else self.vit


class PointCloudSAMNN(nn.Module):
    """Voronoi-tokenizer Point-SAM (reference pc_sam.py:199-374)."""

    cfg: VoronoiConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbedNN(
            num_patches=c.num_patches,
            hidden_dim=c.hidden_dim,
            out_channels=c.patch_embed_channels,
            dtype=self.dtype,
        )
        self.pc_encoder = PointCloudEncoder(
            c.vit_cfg, embed_dim=c.embed_dim,
            patch_embed_channels=c.patch_embed_channels, dtype=self.dtype,
            vit_remat=c.vit_remat,
        )
        self.point_encoder = PointEncoder(c.embed_dim, dtype=self.dtype)
        self.mask_encoder = MaskEncoderNN(
            embed_dim=c.embed_dim, num_patches=c.num_patches, dtype=self.dtype
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.embed_dim,
            num_multimask_outputs=c.num_multimask_outputs,
            depth=c.decoder_depth,
            num_heads=c.decoder_num_heads,
            mlp_dim=c.decoder_mlp_dim,
            dtype=self.dtype,
        )

    def encode(self, coords, features, geom, *, deterministic=True):
        emb = self.patch_embed(coords, features, geom)
        pc_embeddings = self.pc_encoder(
            emb, geom["centers"], deterministic=deterministic
        )
        pc_pe = self.point_encoder.pe_layer(geom["centers"])
        return pc_embeddings, pc_pe

    def decode(self, pc_embeddings, pc_pe, coords, geom, prompt_coords,
               prompt_labels, prompt_masks=None, *, prompt_valid=None,
               multimask_output=True):
        sparse = self.point_encoder(prompt_coords, prompt_labels)
        dense = self.mask_encoder(
            prompt_masks, coords, geom["centers"], geom["nn_idx"],
            geom.get("point_valid"),
            nbr_dist=geom.get("mask_nbr_dist"),
        )
        return self.mask_decoder(
            pc_embeddings, pc_pe, sparse, dense,
            interp_index=geom["interp_index"],
            interp_weight=geom["interp_weight"],
            prompt_valid=prompt_valid,
            multimask_output=multimask_output,
        )

    def predict_masks(self, coords, features, prompt_coords, prompt_labels,
                      prompt_masks=None, *, prompt_valid=None,
                      point_valid=None, multimask_output=True):
        geom = compute_geometry_voronoi(
            coords, self.cfg.num_patches, point_valid=point_valid
        )
        pc_embeddings, pc_pe = self.encode(coords, features, geom)
        return self.decode(
            pc_embeddings, pc_pe, coords, geom, prompt_coords, prompt_labels,
            prompt_masks, prompt_valid=prompt_valid,
            multimask_output=multimask_output,
        )

    def make_geometry(self, coords, *, point_valid=None, tokenizer=None):
        """See PointCloudSAM.make_geometry; voronoi models only have a
        center count to override."""
        num = tokenizer.num_patches if tokenizer else self.cfg.num_patches
        return compute_geometry_voronoi(coords, num, point_valid=point_valid)

    def _init_probe(self, coords, features):
        """See models.pc_sam.init_variables."""
        geom = compute_geometry_voronoi(coords, self.cfg.num_patches)
        pc_embeddings, pc_pe = self.encode(coords, features, geom)
        B, N = coords.shape[:2]
        pc, pl = coords[:, :1, :], jnp.ones((B, 1), bool)
        a = self.decode(pc_embeddings, pc_pe, coords, geom, pc, pl, None,
                        multimask_output=True)
        pm = jnp.zeros((B, N), jnp.float32)
        b = self.decode(pc_embeddings, pc_pe, coords, geom, pc, pl, pm,
                        multimask_output=False)
        return a, b

    def __call__(self, coords, features, gt_masks, *, is_eval=False,
                 point_valid=None):
        geom = compute_geometry_voronoi(
            coords, self.cfg.num_patches, point_valid=point_valid
        )
        pc_embeddings, pc_pe = self.encode(
            coords, features, geom, deterministic=is_eval
        )
        # Iteration-invariant mask-prompt features, computed once for all
        # prompt_iters decodes (see prompt_encoder.mask_nbr_dist).
        geom = dict(geom)
        geom["mask_nbr_dist"] = mask_nbr_dist(
            coords, geom["centers"], geom["nn_idx"]
        )
        return _click_loop(
            self, pc_embeddings, pc_pe, coords, geom, gt_masks,
            is_eval=is_eval, point_valid=point_valid, sampler="fixed",
        )


# ================================================================== hier
@dataclasses.dataclass(frozen=True)
class HierConfig:
    vit: str | ViTConfig = "eva02_large"
    tokenizer: HierTokenizerConfig = HierTokenizerConfig()
    embed_dim: int = 256
    patch_embed_channels: int = 512
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    prompt_iters: int = 8
    enable_mask_refinement_iterations: bool = True
    vit_remat: bool = True  # see PointSAMConfig.vit_remat

    @property
    def vit_cfg(self) -> ViTConfig:
        return get_vit_config(self.vit) if isinstance(self.vit, str) else self.vit


class MaskDecoderHier(nn.Module):
    """Two-stage upscaling decoder (reference mask_decoder.py:214-370)."""

    transformer_dim: int = 256
    encoder_dim: int = 128  # level-1 embedding width for the skip concat
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, pc_embeddings, pc_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, *, geom, embeddings_l1,
                 prompt_valid=None, multimask_output=True):
        D = self.transformer_dim
        BM = sparse_prompt_embeddings.shape[0]

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, D), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, D), jnp.float32)
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None].astype(self.dtype),
            (BM, 1 + self.num_mask_tokens, D),
        )
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings.astype(self.dtype)], axis=1
        )
        token_valid = None
        if prompt_valid is not None:
            token_valid = jnp.concatenate(
                [jnp.ones((BM, 1 + self.num_mask_tokens), bool), prompt_valid],
                axis=1,
            )

        repeats = BM // pc_embeddings.shape[0]
        src = repeat_interleave(pc_embeddings, repeats, axis=0)
        pos_src = repeat_interleave(pc_pe, repeats, axis=0).astype(self.dtype)
        if dense_prompt_embeddings.shape[0] != BM:
            dense_prompt_embeddings = repeat_interleave(
                dense_prompt_embeddings,
                BM // dense_prompt_embeddings.shape[0], axis=0,
            )
        src = src + dense_prompt_embeddings

        hs, src = TwoWayTransformer(
            depth=self.depth, embed_dim=D, num_heads=self.num_heads,
            mlp_dim=self.mlp_dim, dtype=self.dtype, name="transformer",
        )(src, pos_src, tokens, token_valid=token_valid)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        # Geometry weights are non-differentiable by contract (same
        # enforcement as models/mask_decoder.py; ADVICE r4 — keeps the
        # fused VJP's zero-weight-cotangent identical to the XLA path).
        geom = dict(geom)
        for k in ("interp_weight", "interp_weight_21"):
            if k in geom:
                geom[k] = jax.lax.stop_gradient(geom[k])

        # Stage 2->1: interpolate G2 tokens onto G1 centers, concat level-1
        # embeddings (skip connection), project (reference :322-323).
        x = interpolate_features_repeated(
            src, geom["interp_index_21"], geom["interp_weight_21"]
        )  # [B*M, G1, D]
        e1 = repeat_interleave(
            embeddings_l1.astype(x.dtype), BM // embeddings_l1.shape[0], axis=0
        )
        x = jnp.concatenate([x, e1], axis=-1)
        x = _mlp_ln(x, D, D, self.dtype, "output_upscaling2", final_gelu=False)

        # Stage 1->points (reference :324-325) — with output_upscaling1's
        # first Dense HOISTED to the G1 scale: the 3-NN interp weights sum
        # to 1, so Dense(interp(x)) == interp(Dense(x)) and projecting
        # [B*M, G1, D] instead of [B*M, N, D] is ~N/G1 cheaper (same hoist
        # as models/mask_decoder.py). The LN-GELU-Dense-GELU tail + the
        # hypernet dot then run as ONE fused Pallas kernel on TPU
        # (ops/upscale_pallas.py) that reads the interpolated features once.
        x = nn.Dense(D // 2, dtype=self.dtype, param_dtype=jnp.float32,
                     name="output_upscaling1_fc1")(x.astype(self.dtype))
        # [B*M, G1, D//2] — interpolation to N happens inside the fused
        # kernel when dispatchable, else explicitly below.

        token_slice = (
            range(1, self.num_mask_tokens) if multimask_output else range(0, 1)
        )
        hyper_in = jnp.stack(
            [
                MLP(D, D // 2, 3, dtype=self.dtype, name=f"hyper_mlp_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in token_slice
            ],
            axis=1,
        )

        from ..ops.upscale_pallas import (
            interp_upscale_dispatch_ok,
            interp_upscale_hyper_ad,
            upscale_dispatch_ok,
            upscale_hyper_ad,
        )

        N = geom["interp_index"].shape[1]
        C = hyper_in.shape[1]

        def _tail_params():
            ln = self.get_variable("params", "output_upscaling1_norm")
            fc2 = self.get_variable("params", "output_upscaling1_fc2")
            return tuple(
                jnp.asarray(q)
                for q in (ln["LayerNorm_0"]["scale"],
                          ln["LayerNorm_0"]["bias"],
                          fc2["kernel"], fc2["bias"])
            )

        if (
            not self.is_initializing()
            and interp_upscale_dispatch_ok(
                N, x.shape[1], D // 2, C, self.dtype,
                m=x.shape[0] // geom["interp_index"].shape[0])
        ):
            masks = interp_upscale_hyper_ad(
                x, geom["interp_index"], geom["interp_weight"],
                _tail_params(), hyper_in, self.dtype)
        elif (
            not self.is_initializing()
            and upscale_dispatch_ok(N, D // 2, C, self.dtype)
        ):
            x = interpolate_features_repeated(
                x, geom["interp_index"], geom["interp_weight"])
            masks = upscale_hyper_ad(x, _tail_params(), hyper_in, self.dtype)
        else:
            x = interpolate_features_repeated(
                x, geom["interp_index"], geom["interp_weight"])
            x = LayerNorm(dtype=self.dtype, name="output_upscaling1_norm")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(D // 2, dtype=self.dtype, param_dtype=jnp.float32,
                         name="output_upscaling1_fc2")(x)
            upscaled = nn.gelu(x, approximate=False)
            masks = jnp.einsum("bcd,bnd->bcn", hyper_in, upscaled,
                               preferred_element_type=jnp.float32)
        iou_pred = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            self.iou_head_depth, dtype=self.dtype, name="iou_prediction_head",
        )(iou_token_out).astype(jnp.float32)
        return masks, iou_pred[:, list(token_slice)]


def _mlp_ln(x, hidden, out, dtype, name, *, final_gelu):
    """Linear-LN-GELU-Linear(-GELU) upscaling stack (reference :242-254)."""
    x = nn.Dense(hidden, dtype=dtype, param_dtype=jnp.float32,
                 name=f"{name}_fc1")(x.astype(dtype))
    x = LayerNorm(dtype=dtype, name=f"{name}_norm")(x)
    x = nn.gelu(x, approximate=False)
    x = nn.Dense(out, dtype=dtype, param_dtype=jnp.float32,
                 name=f"{name}_fc2")(x)
    return nn.gelu(x, approximate=False) if final_gelu else x


class PointCloudSAMHier(nn.Module):
    """Hierarchical Point-SAM (reference pc_sam.py:377-496)."""

    cfg: HierConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbedHier(
            c.tokenizer, out_channels=c.patch_embed_channels, dtype=self.dtype
        )
        self.pc_encoder = PointCloudEncoder(
            c.vit_cfg, embed_dim=c.embed_dim,
            patch_embed_channels=c.patch_embed_channels, dtype=self.dtype,
            vit_remat=c.vit_remat,
        )
        self.point_encoder = PointEncoder(c.embed_dim, dtype=self.dtype)
        self.mask_encoder = MaskEncoderHier(
            embed_dim=c.embed_dim, radius=c.tokenizer.radius, dtype=self.dtype
        )
        self.mask_decoder = MaskDecoderHier(
            transformer_dim=c.embed_dim,
            num_multimask_outputs=c.num_multimask_outputs,
            depth=c.decoder_depth,
            num_heads=c.decoder_num_heads,
            mlp_dim=c.decoder_mlp_dim,
            dtype=self.dtype,
        )

    def encode(self, coords, features, geom, *, deterministic=True):
        x1, x2 = self.patch_embed(coords, features, geom)
        pc_embeddings = self.pc_encoder(
            x2, geom["centers2"], deterministic=deterministic
        )
        pc_pe = self.point_encoder.pe_layer(geom["centers2"])
        return pc_embeddings, pc_pe, x1

    def decode(self, pc_embeddings, pc_pe, coords, geom, embeddings_l1,
               prompt_coords, prompt_labels, prompt_masks=None, *,
               prompt_valid=None, multimask_output=True):
        sparse = self.point_encoder(prompt_coords, prompt_labels)
        _, dense = self.mask_encoder(
            prompt_masks, coords, geom["centers1"], geom["knn_idx1"],
            geom["centers2"], geom["knn_idx2"],
            rel_xyz1=geom.get("mask_rel_xyz1"),
            rel_xyz2=geom.get("mask_rel_xyz2"),
        )
        return self.mask_decoder(
            pc_embeddings, pc_pe, sparse, dense,
            geom=geom, embeddings_l1=embeddings_l1,
            prompt_valid=prompt_valid, multimask_output=multimask_output,
        )

    def predict_masks(self, coords, features, prompt_coords, prompt_labels,
                      prompt_masks=None, *, prompt_valid=None,
                      point_valid=None, multimask_output=True):
        geom = compute_geometry_hier(
            coords, self.cfg.tokenizer, point_valid=point_valid
        )
        pc_embeddings, pc_pe, x1 = self.encode(coords, features, geom)
        return self.decode(
            pc_embeddings, pc_pe, coords, geom, x1, prompt_coords,
            prompt_labels, prompt_masks, prompt_valid=prompt_valid,
            multimask_output=multimask_output,
        )

    def make_geometry(self, coords, *, point_valid=None, tokenizer=None):
        """See PointCloudSAM.make_geometry."""
        return compute_geometry_hier(
            coords, tokenizer or self.cfg.tokenizer, point_valid=point_valid
        )

    def _init_probe(self, coords, features):
        """See models.pc_sam.init_variables."""
        geom = compute_geometry_hier(coords, self.cfg.tokenizer)
        pc_embeddings, pc_pe, x1 = self.encode(coords, features, geom)
        B, N = coords.shape[:2]
        pc, pl = coords[:, :1, :], jnp.ones((B, 1), bool)
        a = self.decode(pc_embeddings, pc_pe, coords, geom, x1, pc, pl, None,
                        multimask_output=True)
        pm = jnp.zeros((B, N), jnp.float32)
        b = self.decode(pc_embeddings, pc_pe, coords, geom, x1, pc, pl, pm,
                        multimask_output=False)
        return a, b

    def __call__(self, coords, features, gt_masks, *, is_eval=False,
                 point_valid=None):
        geom = compute_geometry_hier(
            coords, self.cfg.tokenizer, point_valid=point_valid
        )
        pc_embeddings, pc_pe, x1 = self.encode(
            coords, features, geom, deterministic=is_eval
        )
        # Iteration-invariant halves of the two-level mask-prompt grouping,
        # computed once for all prompt_iters decodes (see
        # prompt_encoder.mask_group_rel_xyz).
        r = self.mask_encoder.radius
        geom = dict(geom)
        geom["mask_rel_xyz1"] = mask_group_rel_xyz(
            coords, geom["centers1"], geom["knn_idx1"],
            radius=r[0] if r else None,
        )
        geom["mask_rel_xyz2"] = mask_group_rel_xyz(
            geom["centers1"], geom["centers2"], geom["knn_idx2"],
            radius=r[1] if r else None,
        )
        return _click_loop(
            self, pc_embeddings, pc_pe, coords, geom, gt_masks,
            is_eval=is_eval, point_valid=point_valid,
            sampler="random",  # reference pc_sam.py:434
            decode_extra=dict(embeddings_l1=x1),
        )
