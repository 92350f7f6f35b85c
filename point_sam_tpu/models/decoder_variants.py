"""Experimental mask-upscaling ("propagate") variants (Flax linen).

Equivalents of the reference's experimental decoder family
(pc_sam/model/decoder/*.py, SURVEY.md §2.2 "Experimental decoders"), which
replace the default 3-NN-interpolate + MLP upscaler with alternative
token->point propagation schemes. Like the reference (whose variants are
unwired from any config and partially stale), these are standalone modules;
they share the decoder-side signature

    propagate(xyz [B,N,3], rgb [B,N,C], centers [B,L,3],
              center_feats [B,L,D]) -> [B, N, D]

- ``Propagate``: learned-relative-position MLP blended with
  inverse-square-distance 3-NN interpolation plus a gated residual MLP on
  colors (reference decoder/mask_decoder.py:37-97).
- ``PropagateAttn``: attention over the 3 nearest centers with MLP-embedded
  query/key positions (reference decoder/mask_decoder_trm.py:38-90; the
  stray debug print is not reproduced).
- ``PropagateNN``: voronoi 1-NN gather with a random-Fourier relative-
  position encoding added to the center feature, through a residual MLP
  (reference decoder/mask_decoder_voronoi.py:65-106).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import batch_index_select, knn, nn1
from .layers import MLP, LayerNorm

Dtype = Any


class _MlpLnGelu(nn.Module):
    """Linear-LN-GELU-Linear (the variants' shared block)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(x.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


def _knn3_weights(xyz, centers, eps=1e-8):
    d2, idx = knn(xyz, centers, 3)
    recip = 1.0 / (d2 + eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return idx, weight


class Propagate(nn.Module):
    """(reference decoder/mask_decoder.py:37-97)."""

    feats_dim: int
    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, rgb, centers, center_feats):
        idx, weight = _knn3_weights(xyz, centers)
        rela_xyz = batch_index_select(centers, idx) - xyz[:, :, None, :]
        rela_feats = _MlpLnGelu(self.hidden_dim, self.feats_dim,
                                dtype=self.dtype, name="relative_mlp")(rela_xyz)
        rela_feats = jnp.einsum(
            "bnkd,bnk->bnd", rela_feats, weight.astype(rela_feats.dtype)
        )
        nbr_feats = batch_index_select(center_feats, idx)  # [B, N, 3, D]
        interp = jnp.einsum(
            "bnkd,bnk->bnd", nbr_feats, weight.astype(nbr_feats.dtype)
        )
        skip = rela_feats + interp
        x = jnp.concatenate([skip, rgb.astype(skip.dtype)], axis=-1)
        x = _MlpLnGelu(self.hidden_dim, self.feats_dim, dtype=self.dtype,
                       name="mlp")(x)
        return _MlpLnGelu(self.hidden_dim, self.feats_dim, dtype=self.dtype,
                          name="fc")(skip + x)


class PropagateAttn(nn.Module):
    """(reference decoder/mask_decoder_trm.py:38-90)."""

    feats_dim: int
    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, rgb, centers, center_feats):
        idx, _ = _knn3_weights(xyz, centers)
        keys = batch_index_select(centers, idx)  # [B, N, 3, 3]
        values = batch_index_select(center_feats, idx)  # [B, N, 3, D]

        q = MLP(64, 64, 3, dtype=self.dtype, name="q_mlp")(
            xyz[:, :, None, :].astype(self.dtype)
        )  # [B, N, 1, 64]
        k = MLP(64, 64, 3, dtype=self.dtype, name="k_mlp")(
            keys.astype(self.dtype)
        )  # [B, N, 3, 64]
        logits = jnp.einsum("bnqe,bnke->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(q.shape[-1]))
        w = jax.nn.softmax(logits, axis=-1)[:, :, 0, :]  # [B, N, 3]
        attended = jnp.einsum("bnkd,bnk->bnd", values, w.astype(values.dtype))

        x = jnp.concatenate([attended, xyz.astype(attended.dtype)], axis=-1)
        return _MlpLnGelu(self.hidden_dim, self.feats_dim, dtype=self.dtype,
                          name="mlp")(x)


class PropagateNN(nn.Module):
    """(reference decoder/mask_decoder_voronoi.py:65-106)."""

    feats_dim: int
    hidden_dim: int = 128
    num_res_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, rgb, centers, center_feats):
        _, idx = nn1(xyz, centers)  # [B, N]
        feats = batch_index_select(center_feats, idx)  # [B, N, D]
        nbr = xyz - batch_index_select(centers, idx)
        dist = jnp.linalg.norm(nbr, axis=-1, keepdims=True)
        unit = nbr / (dist + 1e-8)

        mat = self.variable(
            "buffers", "gaussian_matrix",
            lambda: jax.random.normal(
                self.make_rng("params"), (3, self.feats_dim // 2), jnp.float32
            ),
        ).value
        pe = (unit.astype(jnp.float32) @ mat) * (2.0 * jnp.pi)
        pe = jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)

        x = feats + pe.astype(feats.dtype)
        # ResMlp (reference prompt_encoder.py:199-211 structure).
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="res_in")(x.astype(self.dtype))
        h = LayerNorm(dtype=self.dtype, name="res_in_norm")(h)
        h = nn.gelu(h, approximate=False)
        for i in range(self.num_res_layers):
            r = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"res_{i}")(h)
            r = LayerNorm(dtype=self.dtype, name=f"res_{i}_norm")(r)
            h = h + nn.gelu(r, approximate=False)
        return nn.Dense(self.feats_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="res_out")(h)


class PatchDropout(nn.Module):
    """Random token keep via gumbel-topk (reference pc_encoder.py:44-81;
    asserted off in the reference because it is incompatible with the
    decoder's center-aligned upscaling — kept here for API parity and
    encoder-only uses). Fixed-shape: returns kept tokens + their indices."""

    prob: float
    num_prefix_tokens: int = 0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if deterministic or self.prob == 0.0:
            return x, None
        p = self.num_prefix_tokens
        prefix, body = x[:, :p], x[:, p:]
        B, L = body.shape[:2]
        num_keep = max(1, int(L * (1.0 - self.prob)))
        noise = jax.random.normal(self.make_rng("dropout"), (B, L))
        _, keep = jax.lax.top_k(noise, num_keep)
        kept = batch_index_select(body, keep)
        if p:
            kept = jnp.concatenate([prefix, kept], axis=1)
        return kept, keep
