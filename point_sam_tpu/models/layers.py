"""Shared neural building blocks (Flax linen).

Dtype policy used across the framework: parameters are stored fp32
(``param_dtype``); compute runs in ``dtype`` (bf16 on TPU for the big
matmuls, matching the reference's bf16 autocast training,
scripts/train_large.sh:1); LayerNorm statistics are always fp32. This
replaces the reference's apex FusedLayerNorm substitution
(pc_sam/utils/torch_utils.py:28-38) — XLA fuses layernorm natively, so
numerics policy is the only thing to manage.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _gelu_exact(x):
    """erf-GELU: matches torch nn.GELU's default, which the reference uses
    everywhere — the tanh approximation differs by up to ~3e-4 and breaks
    checkpoint-parity tests."""
    return nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype.

    epsilon=1e-5 and two-pass variance match torch nn.LayerNorm (the
    reference's normalization everywhere) — flax's defaults (1e-6, fast
    variance) deviate by up to ~1e-4 and break checkpoint parity.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(
            epsilon=1e-5,
            use_fast_variance=False,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class MLPBlock(nn.Module):
    """Two-layer MLP, Linear-act-Linear (reference: transformer.py:240-253)."""

    mlp_dim: int
    out_dim: int
    act: Callable = _gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = self.act(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)


class MLP(nn.Module):
    """N-layer ReLU MLP head (reference: mask_decoder.py:189-211)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.hidden_dim if i < self.num_layers - 1 else self.output_dim
            x = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class PointNetLayer(nn.Module):
    """Dense-LN-GELU-Dense, the conv unit of the PointNet patch encoder
    (reference: common.py:486-497).

    Inputs are flattened to 2-D around the matmuls: dots over >2-D operands
    can take XLA's TPU convolution emitter, whose cost model CHECK-crashes
    on some [B, G, K, C] shapes this encoder produces; the 2-D form always
    uses the plain matrix path.
    """

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    act: str = "erf"

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = LayerNorm(dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=self.act == "tanh")
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(shape[:-1] + (self.out_dim,))


class CoordMLP(nn.Module):
    """3 -> hidden -> GELU -> out positional embedding of patch centers
    (reference: pc_encoder.py:102-104)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, coords):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            coords.astype(self.dtype)
        )
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)


def dense_stack(dims: Sequence[int], dtype: Dtype):  # pragma: no cover - helper
    return [nn.Dense(d, dtype=dtype, param_dtype=jnp.float32) for d in dims]
