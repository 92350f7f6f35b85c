"""Mask decoder (Flax linen).

Equivalent of the reference's ``MaskDecoder`` (reference:
mask_decoder.py:21-184): concat [iou_token, mask_tokens, sparse prompts],
broadcast pc embeddings B -> B*M and add dense prompt embeddings, run the
two-way transformer, upscale the pc tokens to all N points via cached 3-NN
interpolation + MLP, then per-mask-token hypernetwork MLPs dotted with the
upscaled per-point features produce mask logits; an IoU head scores each
mask. Multimask slicing (tokens 1..C on the first click, token 0 after,
reference :91-95) is a *static* choice here — the click loop is unrolled.

The hypernet-dot is the [B*M, C, D] x [B*M, N, D]^T matmul — one of the hot
ops at large N; it maps straight onto the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import interpolate_features_repeated
from .layers import LayerNorm, MLP
from .transformer import TwoWayTransformer

Dtype = Any


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    # Two-way transformer shape (reference configs/model/default.yaml:20-26).
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32
    # Optional point-axis sharding of the N-point upscale (3-NN interp ->
    # MLP -> hypernet dot): with a mesh set, GSPMD partitions the [B*M, N,
    # D] upscaled activations and the [B*M, C, N] mask matmul over
    # ``point_axis`` — the decoder's long-context story for giant scenes
    # (SURVEY §5), extending parallel/sharded_geometry.py beyond kNN.
    # Set via models.for_sharded_eval; None = single-device layout.
    point_mesh: Any = None
    point_axis: str = "data"

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    def setup(self):
        D = self.transformer_dim
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, D), jnp.float32
        )
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (self.num_mask_tokens, D), jnp.float32,
        )
        self.transformer = TwoWayTransformer(
            depth=self.depth, embed_dim=D, num_heads=self.num_heads,
            mlp_dim=self.mlp_dim, dtype=self.dtype,
        )
        self.output_upscaling = OutputUpscaling(D, dtype=self.dtype)
        self.output_hypernetworks_mlps = [
            MLP(D, D, 3, dtype=self.dtype, name=f"hyper_mlp_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            self.iou_head_depth, dtype=self.dtype,
        )

    def __call__(
        self,
        pc_embeddings: jnp.ndarray,
        pc_pe: jnp.ndarray,
        sparse_prompt_embeddings: jnp.ndarray,
        dense_prompt_embeddings: jnp.ndarray,
        *,
        interp_index: jnp.ndarray,
        interp_weight: jnp.ndarray,
        prompt_valid: jnp.ndarray | None = None,
        multimask_output: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Predict masks (reference mask_decoder.py:65-184).

        Args:
            pc_embeddings: [B, G, D] encoder output.
            pc_pe: [B, G, D] center positional encodings.
            sparse_prompt_embeddings: [B*M, P, D] click embeddings (padded).
            dense_prompt_embeddings: [B*M or B, G, D] mask embeddings.
            interp_index / interp_weight: [B, N, 3] cached 3-NN geometry.
            prompt_valid: [B*M, P] bool mask of real click slots.
            multimask_output: static; True -> C = num_multimask_outputs
                masks (tokens 1..C), False -> 1 mask (token 0).

        Returns:
            (masks [B*M, C, N], iou_pred [B*M, C]).
        """
        BM = sparse_prompt_embeddings.shape[0]
        D = self.transformer_dim

        # Geometry is non-differentiable by contract (tokenizer output,
        # computed under stop_gradient). Enforce it HERE so the fused
        # Pallas path (whose custom VJP hard-zeros the weight cotangent)
        # and the XLA fallback have identical gradient semantics even if a
        # caller ever passes differentiable weights (ADVICE r4).
        interp_weight = jax.lax.stop_gradient(interp_weight)

        output_tokens = jnp.concatenate(
            [self.iou_token, self.mask_tokens], axis=0
        ).astype(self.dtype)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (BM, 1 + self.num_mask_tokens, D)
        )
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings.astype(self.dtype)], axis=1
        )
        if prompt_valid is not None:
            token_valid = jnp.concatenate(
                [
                    jnp.ones((BM, 1 + self.num_mask_tokens), bool),
                    prompt_valid,
                ],
                axis=1,
            )
        else:
            token_valid = None

        # Broadcast per-cloud tensors to per-mask rows (reference :136-139).
        repeats = BM // pc_embeddings.shape[0]
        from ..ops import repeat_interleave

        src = repeat_interleave(pc_embeddings, repeats, axis=0)
        pos_src = repeat_interleave(pc_pe, repeats, axis=0).astype(self.dtype)
        if dense_prompt_embeddings.shape[0] != BM:
            dense_prompt_embeddings = repeat_interleave(
                dense_prompt_embeddings, BM // dense_prompt_embeddings.shape[0],
                axis=0,
            )
        src = src + dense_prompt_embeddings

        hs, src = self.transformer(src, pos_src, tokens, token_valid=token_valid)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]

        # Upscale: 3-NN interpolate pc tokens to all N points, then MLP
        # (reference :147-164) — with the MLP's FIRST Dense hoisted to the
        # G-token scale: the 3-NN interp weights sum to 1
        # (ops/interp.py::compute_interp_weights), so Dense(interp(x)) ==
        # interp(Dense(x)) in real arithmetic, and projecting the [B*M, G,
        # D] tokens instead of the [B*M, N, D] interpolated features is
        # ~N/G (≈50x at the eval config) cheaper in FLOPs and removes one
        # full-size HBM round trip. The reference orders it interp-then-MLP
        # (mask_decoder.py:147-163).
        src = self.output_upscaling.project(src)
        if self.point_mesh is not None:
            # Point-axis sharding: the interp gather reads from the small
            # REPLICATED token set, so an index/weight constraint is all
            # GSPMD needs to partition the whole upscale + hypernet chain;
            # every [.., N, ..] intermediate (the HBM hog at giant N)
            # stays sharded until the mask logits.
            from jax.sharding import NamedSharding, PartitionSpec as P_

            shard_n = NamedSharding(
                self.point_mesh, P_(None, self.point_axis, None))
            interp_index = jax.lax.with_sharding_constraint(
                interp_index, shard_n)
            interp_weight = jax.lax.with_sharding_constraint(
                interp_weight, shard_n)
        token_slice = (
            range(1, self.num_mask_tokens) if multimask_output else range(0, 1)
        )
        hyper_in = jnp.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
                for i in token_slice
            ],
            axis=1,
        )  # [B*M, C, D]

        from ..ops.upscale_pallas import (
            interp_upscale_dispatch_ok,
            interp_upscale_hyper_ad,
            upscale_dispatch_ok,
            upscale_hyper_ad,
        )

        C = hyper_in.shape[1]
        N = interp_index.shape[1]
        masks = None
        if (
            not self.is_initializing()
            and self.point_mesh is not None
            and N % self.point_mesh.shape[self.point_axis] == 0
            and interp_upscale_dispatch_ok(
                N // self.point_mesh.shape[self.point_axis],
                src.shape[1], D, C, self.dtype,
                m=BM // interp_index.shape[0])
        ):
            # Sharded fused decode (VERDICT r4 #5): the N tiles of the
            # interp-fused kernel are independent, so run the kernel
            # per-shard under shard_map — tokens/hyper replicated, the
            # 3-NN geometry and the [B*M, C, N] logits split on the point
            # axis. Giant-scene eval (for_sharded_eval) now gets the same
            # kernel as single-device decode instead of the XLA
            # gather+tail chain it used to fall back to.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P_

            ax = self.point_axis
            dt = self.dtype

            def _local_fused(h1, idx, wts, prm, hy):
                return interp_upscale_hyper_ad(h1, idx, wts, prm, hy, dt)

            masks = shard_map(
                _local_fused, mesh=self.point_mesh,
                in_specs=(P_(), P_(None, ax, None), P_(None, ax, None),
                          P_(), P_()),
                out_specs=P_(None, None, ax),
                check_vma=False,
            )(src, interp_index, interp_weight,
              self._upscale_tail_params(), hyper_in)
        fusable = not self.is_initializing() and self.point_mesh is None
        if masks is not None:
            pass
        elif fusable and interp_upscale_dispatch_ok(
                N, src.shape[1], D, C, self.dtype,
                m=BM // interp_index.shape[0]):
            # Fully fused decode tail: 3-NN interp (as a weighted one-hot
            # MXU matmul against the VMEM-resident token table) + LN ->
            # GELU -> Dense -> GELU -> hypernet dot in ONE Pallas kernel —
            # the [B*M, N, D] interpolated tensor never exists in HBM
            # (kbench7: the XLA gather alone was 11.5 ms of the 17.6 ms
            # decode at the eval shape). XLA-recompute backward.
            masks = interp_upscale_hyper_ad(
                src, interp_index, interp_weight,
                self._upscale_tail_params(), hyper_in, self.dtype)
        elif fusable and upscale_dispatch_ok(N, D, C, self.dtype):
            # Fused tail only (G too wide for the in-kernel interp): XLA
            # gather + LN -> GELU -> Dense -> GELU -> hypernet dot
            # streamed over N tiles in VMEM (see ops/upscale_pallas.py).
            interp = interpolate_features_repeated(
                src, interp_index, interp_weight)
            masks = upscale_hyper_ad(
                interp, self._upscale_tail_params(), hyper_in, self.dtype)
        else:
            interp = interpolate_features_repeated(
                src, interp_index, interp_weight)
            upscaled = self.output_upscaling.finish(interp)  # [B*M, N, D]
            if self.point_mesh is not None:
                upscaled = jax.lax.with_sharding_constraint(
                    upscaled,
                    NamedSharding(self.point_mesh,
                                  P_(None, self.point_axis, None)))
            masks = jnp.einsum(
                "bcd,bnd->bcn", hyper_in, upscaled,
                preferred_element_type=jnp.float32,
            )

        iou_pred = self.iou_prediction_head(iou_token_out).astype(jnp.float32)
        iou_pred = iou_pred[:, list(token_slice)]
        return masks, iou_pred

    def _upscale_tail_params(self) -> tuple:
        """OutputUpscaling's LN + Dense_1 leaves for the fused kernels
        (identical tree; checkpoints and the XLA path are unaffected)."""
        p = self.get_variable("params", "output_upscaling")
        return tuple(
            jnp.asarray(q)
            for q in (
                p["LayerNorm_0"]["LayerNorm_0"]["scale"],
                p["LayerNorm_0"]["LayerNorm_0"]["bias"],
                p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
            )
        )


class OutputUpscaling(nn.Module):
    """Linear-LN-GELU-Linear-GELU on interpolated per-point features
    (reference mask_decoder.py:53-59).

    Split into ``project`` (the first Linear) and ``finish`` (the rest) so
    the caller can hoist the projection BEFORE the 3-NN interpolation —
    exact, since the interp weights sum to 1 — turning a [B*M, N, D]
    matmul into a [B*M, G, D] one. Explicit submodule names keep the param
    tree identical to the original nn.compact layout (checkpoints and
    utils/convert.py rules unaffected).
    """

    dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.proj = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="Dense_0",
        )
        self.norm = LayerNorm(dtype=self.dtype, name="LayerNorm_0")
        self.out = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="Dense_1",
        )

    def project(self, x):
        return self.proj(x.astype(self.dtype))

    def finish(self, x):
        x = self.norm(x)
        x = nn.gelu(x, approximate=False)
        return nn.gelu(self.out(x), approximate=False)

    def __call__(self, x):
        return self.finish(self.project(x))
