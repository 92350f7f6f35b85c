"""PointCloudSAM: the top-level promptable segmentation model (Flax linen).

Equivalent of the reference's ``PointCloudSAM`` (reference: pc_sam.py:20-196):
wires the point-cloud ViT encoder, click/mask prompt encoders and the mask
decoder; provides the one-shot ``predict_masks`` API (reference :37-88) and
the training ``__call__`` that encodes once, then runs ``prompt_iters``
click-simulation iterations (reference :139-194), carrying the
most-confident mask logits forward as the next iteration's mask prompt.

TPU-first redesign of the click loop:
- The loop is unrolled over the static ``prompt_iters``; every iteration has
  static shapes (the prompt buffer grows by one *static* slot per step).
- Click sampling runs on-device (ops.sampler) instead of the reference's
  host loops.
- SAM's two "mask-refinement-only" iterations (reference :128-134, following
  SAM paper Appendix A): the last iteration is statically click-free; the
  randomly sampled one is handled with a traced validity bit — the click is
  computed and then masked out of attention, keeping shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import batch_index_select, sample_prompts, sample_prompts_random
from .mask_decoder import MaskDecoder
from .pc_encoder import PatchEmbed, PointCloudEncoder
from .prompt_encoder import MaskEncoder, PointEncoder, mask_group_rel_xyz
from .tokenizer import TokenizerConfig, compute_geometry
from .vit import ViTConfig, get_vit_config

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PointSAMConfig:
    """Model hyperparameters (reference configs/model/default.yaml)."""

    vit: str | ViTConfig = "eva02_large"
    tokenizer: TokenizerConfig = TokenizerConfig(num_patches=1024, patch_size=256)
    embed_dim: int = 256
    patch_embed_channels: int = 512
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    prompt_iters: int = 5
    enable_mask_refinement_iterations: bool = True
    # Optional mesh for point-axis-sharded decoding of giant scenes (the
    # [B*M, N, D] upscale + hypernet matmul; see MaskDecoder.point_mesh).
    # Set via models.for_sharded_eval — not by hand.
    decode_point_mesh: Any = None
    decode_point_axis: str = "data"
    # ViT block remat: needed for training memory; inference-only programs
    # should build with False (see PointCloudEncoder.vit_remat — the
    # remat+scan composition wedges the remote compile service). The param
    # tree is identical either way, so checkpoints transfer freely.
    vit_remat: bool = True
    # Patch-encoder GELU flavor: "erf" = torch nn.GELU default (exact
    # checkpoint parity with the reference, common.py:489); "tanh" = torch's
    # nn.GELU(approximate='tanh') — saves ~1.7 ms/cloud in the fused TPU
    # kernel (kbench5 r5) and deviates from erf by <= ~3e-4, an order of
    # magnitude below one bf16 ulp of the activations downstream. Params
    # are act-independent, so checkpoints transfer freely between the two.
    patch_act: str = "erf"

    @property
    def vit_cfg(self) -> ViTConfig:
        return get_vit_config(self.vit) if isinstance(self.vit, str) else self.vit


def for_inference(model):
    """Copy of a Point-SAM module with ViT remat disabled.

    The param tree is identical (nn.remat preserves names), so variables
    transfer directly. Inference-only programs should use this: remat is
    pure compile-time cost without a backward pass, and the remat+scan ViT
    composed into the full encode graph wedges the remote XLA compile
    service (see PointSAMConfig.vit_remat)."""
    import dataclasses as _dc

    cfg = model.cfg
    if not getattr(cfg, "vit_remat", False):
        return model
    return type(model)(_dc.replace(cfg, vit_remat=False), dtype=model.dtype)


def cast_params_for_inference(variables, dtype=None):
    """Pre-cast matmul kernels to the compute dtype for inference programs.

    Every ``kernel`` leaf in this framework belongs to an ``nn.Dense`` whose
    compute dtype is the model dtype (bf16 on TPU), so flax's promote_dtype
    casts it fp32 -> bf16 inside EVERY dispatch anyway — pre-casting is
    bit-identical and removes the per-dispatch HBM convert: at ViT-L that
    convert reads ~1.2 GB fp32 and writes ~0.6 GB bf16 of weights per
    encode (~2 ms of pure bandwidth on a v5e, none of it compute).
    LayerNorm scale/bias (leaf names ``scale``/``bias``) and every other
    fp32-consumed leaf are left untouched, so LN statistics and Pallas
    kernels that take fp32 params keep exact numerics.

    Training must NOT use this (fp32 master weights); it is applied by
    serving/predictor.py and bench.py's inference stages.
    """
    import flax
    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if dtype is None else dtype
    flat = flax.traverse_util.flatten_dict(variables)
    flat = {
        k: (v.astype(dtype)
            if k[-1] == "kernel" and v.dtype == _jnp.float32 else v)
        for k, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(flat)


def for_sharded_eval(model, mesh, *, axis: str = "data"):
    """Copy of a Point-SAM module whose decoder shards the N-point upscale
    + hypernet matmul over ``mesh``'s ``axis`` (GSPMD constraints; see
    MaskDecoder.point_mesh). The param tree is identical, so variables
    transfer directly — used by the big-scene evaluator together with the
    point-axis-sharded geometry (parallel/sharded_geometry.py)."""
    import dataclasses as _dc

    cfg = model.cfg
    if getattr(cfg, "decode_point_mesh", None) is mesh:
        return model
    return type(model)(
        _dc.replace(cfg, decode_point_mesh=mesh, decode_point_axis=axis),
        dtype=model.dtype,
    )


def init_variables(model, rng, *, num_points: int = 256, num_features: int = 3):
    """Initialize ALL model parameters (encoder, prompt encoders including
    the mask path, decoder) with tiny synthetic inputs.

    Flax creates parameters lazily at first use, so initializing through an
    API that skips the mask-prompt path (e.g. a single un-masked
    ``predict_masks``) produces an incomplete param tree. This helper traces
    the dedicated ``_init_probe`` method which exercises every path. Works
    for PointCloudSAM and its voronoi/hier variants.

    The number of points only shapes the init trace — parameters are
    shape-independent of N/G/K, so variables from here work at any size.
    """
    import jax

    n = num_points
    g = getattr(getattr(model.cfg, "tokenizer", None), "num_patches", None)
    if isinstance(g, tuple):  # hier
        n = max(n, g[0] * 2)
    elif g is not None:
        n = max(n, g * 2)
    else:  # voronoi
        n = max(n, model.cfg.num_patches * 2)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0) if rng is None else rng)
    coords = jax.random.uniform(k0, (1, n, 3), jnp.float32, -0.9, 0.9)
    feats = jax.random.uniform(k1, (1, n, num_features), jnp.float32)
    return jax.jit(
        lambda c, f: model.init({"params": k0}, c, f,
                                method=model._init_probe)
    )(coords, feats)


class PointCloudSAM(nn.Module):
    cfg: PointSAMConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(
            c.tokenizer, out_channels=c.patch_embed_channels,
            dtype=self.dtype, act=c.patch_act,
        )
        self.pc_encoder = PointCloudEncoder(
            c.vit_cfg,
            embed_dim=c.embed_dim,
            patch_embed_channels=c.patch_embed_channels,
            dtype=self.dtype,
            vit_remat=c.vit_remat,
        )
        self.point_encoder = PointEncoder(c.embed_dim, dtype=self.dtype)
        self.mask_encoder = MaskEncoder(c.embed_dim, dtype=self.dtype,
                                        act=c.patch_act)
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.embed_dim,
            num_multimask_outputs=c.num_multimask_outputs,
            depth=c.decoder_depth,
            num_heads=c.decoder_num_heads,
            mlp_dim=c.decoder_mlp_dim,
            dtype=self.dtype,
            point_mesh=c.decode_point_mesh,
            point_axis=c.decode_point_axis,
        )

    # -------------------------------------------------------------- geometry
    def make_geometry(self, coords, *, point_valid=None, tokenizer=None):
        """Parameter-free tokenizer geometry for this model (callable on the
        unbound module — uses only cfg). Serving/eval may override the
        tokenizer for large scenes (reference eval_kitti.py:350-362)."""
        return compute_geometry(
            coords, tokenizer or self.cfg.tokenizer, point_valid=point_valid
        )

    # ---------------------------------------------------------------- encode
    def encode(self, coords, features, geom, *, deterministic=True):
        """Tokenize + ViT-encode one point cloud batch.

        Returns (pc_embeddings [B, G, D], pc_pe [B, G, D]).
        """
        emb = self.patch_embed(coords, features, geom)
        pc_embeddings = self.pc_encoder(
            emb, geom["centers"], deterministic=deterministic
        )
        pc_pe = self.point_encoder.pe_layer(geom["centers"])
        return pc_embeddings, pc_pe

    # ---------------------------------------------------------------- decode
    def decode(
        self,
        pc_embeddings,
        pc_pe,
        coords,
        geom,
        prompt_coords,
        prompt_labels,
        prompt_masks=None,
        *,
        prompt_valid=None,
        multimask_output=True,
    ):
        """One decoder pass given cached embeddings (the cheap per-click op).

        Args:
            prompt_coords: [B*M, P, 3]; prompt_labels: [B*M, P] bool.
            prompt_masks: optional [B*M, N] logits from a previous pass.
            prompt_valid: optional [B*M, P] bool padding mask.

        Returns: (masks [B*M, C, N] fp32 logits, iou_pred [B*M, C] fp32).
        """
        sparse = self.point_encoder(prompt_coords, prompt_labels)
        dense = self.mask_encoder(
            prompt_masks, coords, geom["centers"], geom["knn_idx"],
            rel_xyz=geom.get("mask_rel_xyz"),
        )
        return self.mask_decoder(
            pc_embeddings,
            pc_pe,
            sparse,
            dense,
            interp_index=geom["interp_index"],
            interp_weight=geom["interp_weight"],
            prompt_valid=prompt_valid,
            multimask_output=multimask_output,
        )

    # ---------------------------------------------- one-shot user-facing API
    def predict_masks(
        self,
        coords,
        features,
        prompt_coords,
        prompt_labels,
        prompt_masks=None,
        *,
        prompt_valid=None,
        point_valid=None,
        multimask_output=True,
    ):
        """Reference pc_sam.py:37-88: encode + single decode."""
        geom = compute_geometry(coords, self.cfg.tokenizer, point_valid=point_valid)
        pc_embeddings, pc_pe = self.encode(coords, features, geom)
        return self.decode(
            pc_embeddings,
            pc_pe,
            coords,
            geom,
            prompt_coords,
            prompt_labels,
            prompt_masks,
            prompt_valid=prompt_valid,
            multimask_output=multimask_output,
        )

    def _init_probe(self, coords, features):
        """Initialization-only forward that traces every parametric path
        (flax params are created lazily on first use; initializing via
        ``predict_masks`` without a mask prompt would leave the mask
        encoder's parameters uncreated). Use via ``init_variables``."""
        geom = compute_geometry(coords, self.cfg.tokenizer)
        pc_embeddings, pc_pe = self.encode(coords, features, geom)
        B, N = coords.shape[:2]
        pc = coords[:, :1, :]
        pl = jnp.ones((B, 1), bool)
        a = self.decode(pc_embeddings, pc_pe, coords, geom, pc, pl, None,
                        multimask_output=True)
        pm = jnp.zeros((B, N), jnp.float32)
        b = self.decode(pc_embeddings, pc_pe, coords, geom, pc, pl, pm,
                        multimask_output=False)
        return a, b

    # -------------------------------------------------- training click loop
    def __call__(
        self,
        coords,
        features,
        gt_masks,
        *,
        is_eval: bool = False,
        point_valid=None,
    ):
        """Training/eval forward with simulated clicks (reference :90-196).

        Args:
            coords: [B, N, 3] unit-sphere-normalized coordinates.
            features: [B, N, C] point features (colors).
            gt_masks: [B, M, N] bool.
            is_eval: static; disables refinement-only iterations so every
                iteration adds a click (reference :128-134).

        Returns:
            list (length prompt_iters) of dicts with prompt_coords,
            prompt_labels, prompt_valid, masks, iou_preds, max_iou_pred_ind,
            prompt_masks — mirroring the reference output contract (:185-194).
        """
        geom = compute_geometry(coords, self.cfg.tokenizer,
                                point_valid=point_valid)
        pc_embeddings, pc_pe = self.encode(
            coords, features, geom, deterministic=is_eval
        )
        # The mask prompt encoder regroups neighbor rel-coords every click
        # iteration in the reference (prompt_encoder.py:114-121); they are
        # geometry-only, so compute them once for all prompt_iters decodes.
        geom = dict(geom)
        geom["mask_rel_xyz"] = mask_group_rel_xyz(
            coords, geom["centers"], geom["knn_idx"],
            radius=self.mask_encoder.radius,
        )
        return _click_loop(
            self, pc_embeddings, pc_pe, coords, geom, gt_masks,
            is_eval=is_eval, point_valid=point_valid, sampler="fixed",
        )


# ===================================================== shared click loop
def _click_loop(model, pc_embeddings, pc_pe, coords, geom, gt_masks, *,
                is_eval, point_valid, sampler, decode_extra=None):
    """The shared unrolled prompt-iteration loop (reference pc_sam.py:139-194;
    same semantics as PointCloudSAM.__call__)."""
    c = model.cfg
    B, M, N = gt_masks.shape
    BM = B * M
    iters = c.prompt_iters

    buf_coords = jnp.zeros((BM, iters, 3), coords.dtype)
    buf_labels = jnp.zeros((BM, iters), bool)
    buf_valid = jnp.zeros((BM, iters), bool)

    refinement = c.enable_mask_refinement_iterations and not is_eval
    if refinement and iters > 1:
        sampled_refine = jax.random.randint(
            model.make_rng("sampler"), (), 1, iters
        )
    else:
        sampled_refine = jnp.asarray(-1, jnp.int32)

    prompt_masks = None
    outputs = []
    for i in range(iters):
        # Iteration 0 always clicks, even when it's also the last
        # (the reference's `i == 0 or ...` short-circuit, pc_sam.py:140).
        statically_refine = refinement and i == iters - 1 and i != 0
        if not statically_refine:
            # rng drawn unconditionally so the "random" sampler's stream is
            # independent of which iteration was sampled for refinement.
            rng_i = model.make_rng("sampler") if sampler == "random" else None

            def do_sample():
                if sampler == "random":
                    return sample_prompts_random(
                        rng_i, coords, gt_masks, prompt_masks,
                        point_valid=point_valid,
                    )
                return sample_prompts(
                    coords, gt_masks, prompt_masks, point_valid=point_valid
                )

            if i == 0:
                # Iteration 0 always clicks — no cond.
                take = jnp.asarray(True)
                new_pc, new_pl = do_sample()
            else:
                # Skip the whole sampler when this is the randomly sampled
                # refinement-only iteration: the result was previously
                # computed and discarded (~1.5 ms/step at train shapes).
                take = jnp.asarray(i, jnp.int32) != sampled_refine
                new_pc, new_pl = jax.lax.cond(
                    take,
                    do_sample,
                    lambda: (
                        jnp.zeros((BM, 1, 3), coords.dtype),
                        jnp.zeros((BM, 1), bool),
                    ),
                )
            buf_coords = buf_coords.at[:, i].set(jnp.where(take, new_pc[:, 0], 0.0))
            buf_labels = buf_labels.at[:, i].set(new_pl[:, 0] & take)
            buf_valid = buf_valid.at[:, i].set(take)

        extra = decode_extra or {}
        if extra:
            masks, iou_preds = model.decode(
                pc_embeddings, pc_pe, coords, geom, extra["embeddings_l1"],
                buf_coords[:, : i + 1], buf_labels[:, : i + 1], prompt_masks,
                prompt_valid=buf_valid[:, : i + 1], multimask_output=(i == 0),
            )
        else:
            masks, iou_preds = model.decode(
                pc_embeddings, pc_pe, coords, geom,
                buf_coords[:, : i + 1], buf_labels[:, : i + 1], prompt_masks,
                prompt_valid=buf_valid[:, : i + 1], multimask_output=(i == 0),
            )

        if i == 0:
            max_iou_pred_ind = jnp.argmax(iou_preds, axis=1)
            prompt_masks = batch_index_select(masks, max_iou_pred_ind, axis=1)
        else:
            max_iou_pred_ind = jnp.zeros((BM,), jnp.int32)
            prompt_masks = masks[:, 0]

        outputs.append(
            dict(
                prompt_coords=buf_coords[:, : i + 1],
                prompt_labels=buf_labels[:, : i + 1],
                prompt_valid=buf_valid[:, : i + 1],
                masks=masks,
                iou_preds=iou_preds,
                max_iou_pred_ind=max_iou_pred_ind,
                prompt_masks=prompt_masks,
            )
        )
    return outputs
