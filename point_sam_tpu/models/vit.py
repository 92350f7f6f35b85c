"""EVA02-style Vision Transformer backbone (Flax linen).

Our own implementation of the timm EVA/EVA02 blocks *as the reference uses
them*: blocks are invoked positionally with no rotary embeddings and no
attention mask (reference: pc_encoder.py:138-139 — ``for block in
transformer.blocks: x = block(x)``), and the model's own patch/pos-embed and
cls token are bypassed entirely. So the backbone here is exactly the block
stack + final norm.

Block anatomy (matching timm ``Eva`` as instantiated by
``eva02_*`` / ``eva_giant_*``, cf. configs/model/*.yaml:10-13):
- pre-norm attention: separate q/k/v projections with biased q/v and
  bias-free k (EVA02) or a fused qkv (EVA-giant);
- pre-norm MLP: SwiGLU with an inner LayerNorm ("sub-LN", EVA02) or a plain
  GELU MLP (EVA-giant).

Softmax and layernorm statistics run in fp32; matmuls run in the module
``dtype`` (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    mlp_hidden_dim: int
    swiglu: bool = True  # SwiGLU MLP (EVA02) vs plain GELU MLP (EVA-giant)
    mlp_norm: bool = True  # sub-LN inside the MLP (EVA02 "scale_mlp")
    qkv_fused: bool = False  # fused qkv projection (EVA-giant)
    # timm EvaAttention's optional inner LayerNorm applied to the attention
    # output before the final projection ("scale_attn_inner"). Off for the
    # eva02/eva-giant presets as we model them; if the released checkpoint
    # turns out to carry ``blocks.N.attn.norm.*`` tensors, flipping this
    # flag (utils/convert.py maps them) restores numerics parity.
    attn_inner_norm: bool = False
    drop_path_rate: float = 0.0
    # Compile the block stack as ONE lax.scan body instead of `depth`
    # unrolled copies. Identical numerics; params gain a leading [depth]
    # axis (path "blocks/block/..." instead of "blocks_i/..."). This is the
    # standard JAX deep-transformer idiom and cuts XLA compile time of every
    # ViT-L program by ~an order of magnitude (the 24-block unrolled encode
    # graph pathologically slowed — and through the remote-compile tunnel,
    # killed — compilation).
    scan_blocks: bool = True

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


# Shapes match the timm models named in the reference configs
# (configs/model/{base,default,giant}.yaml:12): hidden = int(dim * 4 * 2/3)
# for the SwiGLU EVA02 family; EVA-giant uses a plain MLP with hidden 6144.
VIT_PRESETS: dict[str, ViTConfig] = {
    "eva02_base": ViTConfig(768, 12, 12, int(768 * 4 * 2 / 3)),
    "eva02_large": ViTConfig(1024, 24, 16, int(1024 * 4 * 2 / 3)),
    "eva_giant": ViTConfig(1408, 40, 16, 6144, swiglu=False, mlp_norm=False,
                           qkv_fused=True),
    # Small config for tests / CI.
    "tiny": ViTConfig(128, 2, 4, 256),
}


class EvaAttention(nn.Module):
    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, L, D = x.shape
        if c.qkv_fused:
            qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                         name="q_proj")(x)
            k = nn.Dense(D, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="k_proj")(x)
            v = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                         name="v_proj")(x)

        # mha_flat consumes the projection outputs in [B, L, D] layout
        # directly (packed-heads kernel, ops/attention.py): avoids the four
        # per-layer head-split/merge transposes XLA would otherwise
        # materialize around a [B, H, L, dh] kernel.
        from ..ops.attention import mha_flat  # local import avoids a cycle

        out = mha_flat(q, k, v, c.num_heads)
        if c.attn_inner_norm:
            out = LayerNorm(dtype=self.dtype, name="norm")(out)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwiGLU(nn.Module):
    """SwiGLU MLP with optional inner norm (EVA02 sub-LN)."""

    hidden_dim: int
    out_dim: int
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1_g")(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1_x")(x)
        x = nn.silu(g) * h
        if self.use_norm:
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class GeluMLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class EvaBlock(nn.Module):
    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = EvaAttention(c, dtype=self.dtype, name="attn")(h)
        x = x + h

        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        if c.swiglu:
            h = SwiGLU(c.mlp_hidden_dim, c.embed_dim, use_norm=c.mlp_norm,
                       dtype=self.dtype, name="mlp")(h)
        else:
            h = GeluMLP(c.mlp_hidden_dim, c.embed_dim, dtype=self.dtype,
                        name="mlp")(h)
        return x + h


class _BlockScanBody(nn.Module):
    """nn.scan body: (carry x, per-step input None) -> (x', None)."""

    cfg: ViTConfig
    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x, _):
        block_cls = nn.remat(EvaBlock) if self.remat else EvaBlock
        x = block_cls(self.cfg, dtype=self.dtype, name="block")(x)
        return x, None


class ViT(nn.Module):
    """Block stack + final norm (the parts of timm Eva the reference uses:
    pc_encoder.py:138-142).

    Blocks are rematerialized (``nn.remat``): activations inside each block
    (notably attention probabilities) are recomputed in the backward pass
    instead of stored — without it a ViT-L training step at G=1024 tokens
    exhausts a v5e's 16 GB HBM. Inference jits are unaffected (no grad, no
    residuals).

    With ``cfg.scan_blocks`` (default) the stack is a ``lax.scan`` over one
    shared block body with stacked [depth, ...] parameters — see
    ViTConfig.scan_blocks for why. ``scan_blocks=False`` keeps the unrolled
    per-block param layout ("blocks_i/...").
    """

    cfg: ViTConfig
    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        del deterministic  # no stochastic sublayers (drop path unused)
        x = x.astype(self.dtype)
        if self.cfg.scan_blocks:
            scanned = nn.scan(
                _BlockScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.cfg.depth,
            )(self.cfg, dtype=self.dtype, remat=self.remat, name="blocks")
            x, _ = scanned(x, None)
        else:
            block_cls = nn.remat(EvaBlock) if self.remat else EvaBlock
            for i in range(self.cfg.depth):
                x = block_cls(self.cfg, dtype=self.dtype,
                              name=f"blocks_{i}")(x)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


def get_vit_config(name: str) -> ViTConfig:
    if name not in VIT_PRESETS:
        raise KeyError(f"unknown ViT preset {name!r}; have {sorted(VIT_PRESETS)}")
    return VIT_PRESETS[name]
