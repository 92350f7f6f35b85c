"""SAM-style two-way transformer decoder core (Flax linen).

Equivalent of the reference's ``TwoWayTransformer`` (reference:
transformer.py:15-176): depth blocks of {token self-attention, token->pc
cross-attention, MLP, pc->token cross-attention}, each with residual + LN,
positional encodings re-added at every layer, plus a final token->pc
attention. Cross-attentions run at half the embedding width
(``downsample_rate=2``, reference :56-58,130-141).

TPU-first addition: an optional ``token_valid`` mask. The reference grows
the prompt token list per click (dynamic shapes); we keep a fixed-size
padded token buffer instead, and neutralize padded tokens by masking them
out of the softmax *wherever tokens act as attention keys*. Padded tokens'
own query outputs are garbage but nothing consumes them (output/mask tokens
are always valid).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, MLPBlock

Dtype = Any
_NEG_INF = -1e30  # additive softmax mask; fp32-safe, avoids NaNs of true -inf


class Attention(nn.Module):
    """Multi-head attention with optional width downsampling and key mask
    (reference: transformer.py:179-236)."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, key_valid=None):
        internal = self.embed_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            internal, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("q_proj")(q.astype(self.dtype))
        k = dense("k_proj")(k.astype(self.dtype))
        v = dense("v_proj")(v.astype(self.dtype))

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.num_heads, head_dim)
        k = k.reshape(B, Lk, self.num_heads, head_dim)
        v = v.reshape(B, Lk, self.num_heads, head_dim)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(head_dim))
        if key_valid is not None:
            attn = attn + jnp.where(key_valid, 0.0, _NEG_INF)[:, None, None, :]
        attn = nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Lq, internal)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """(reference: transformer.py:103-176)."""

    embed_dim: int
    num_heads: int
    mlp_dim: int = 2048
    downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, *, query_valid=None):
        attn_kw = dict(dtype=self.dtype)
        # 1) Token self-attention.
        if self.skip_first_layer_pe:
            q_in = queries
        else:
            q_in = queries + query_pe
        attn_out = Attention(self.embed_dim, self.num_heads, name="self_attn",
                             **attn_kw)(q_in, q_in, queries,
                                        key_valid=query_valid)
        queries = queries + attn_out if not self.skip_first_layer_pe else attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm1")(queries)

        # 2) Token -> pc cross-attention.
        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embed_dim, self.num_heads, self.downsample_rate,
            name="cross_attn_token_to_pc", **attn_kw,
        )(q, k, keys)
        queries = queries + attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm2")(queries)

        # 3) MLP on tokens.
        mlp_out = MLPBlock(self.mlp_dim, self.embed_dim, act=nn.relu,
                           dtype=self.dtype, name="mlp")(queries)
        queries = queries + mlp_out
        queries = LayerNorm(dtype=self.dtype, name="norm3")(queries)

        # 4) pc -> token cross-attention (tokens are keys: mask padded ones).
        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embed_dim, self.num_heads, self.downsample_rate,
            name="cross_attn_pc_to_token", **attn_kw,
        )(k, q, queries, key_valid=query_valid)
        keys = keys + attn_out
        keys = LayerNorm(dtype=self.dtype, name="norm4")(keys)

        return queries, keys


class TwoWayTransformer(nn.Module):
    """(reference: transformer.py:15-100)."""

    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    downsample_rate: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pc_embedding, pc_pe, point_embedding, *,
                 token_valid=None):
        """Args:
            pc_embedding: [B, G, D] point-cloud tokens (keys).
            pc_pe: [B, G, D] their positional encoding.
            point_embedding: [B, T, D] prompt/output tokens (queries).
            token_valid: optional [B, T] bool; False = padded prompt slot.

        Returns: (tokens [B, T, D], pc [B, G, D]).
        """
        queries = point_embedding.astype(self.dtype)
        keys = pc_embedding.astype(self.dtype)
        pc_pe = pc_pe.astype(self.dtype)
        point_embedding = queries

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                self.downsample_rate, skip_first_layer_pe=(i == 0),
                dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, pc_pe, query_valid=token_valid)

        q = queries + point_embedding
        k = keys + pc_pe
        attn_out = Attention(
            self.embed_dim, self.num_heads, self.downsample_rate,
            name="final_attn_token_to_pc", dtype=self.dtype,
        )(q, k, keys)
        queries = queries + attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys
