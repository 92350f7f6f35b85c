"""3-NN inverse-square-distance feature interpolation.

TPU-native equivalent of the reference's mask "upsampler" from G patch
tokens to all N points (reference: pc_sam/model/common.py:238-274,
consumed by the mask decoder at mask_decoder.py:147-163). Weights are
computed once per point cloud and cached across click iterations by the
caller (AuxInputs contract), so this is a pure-function pair.
"""

from __future__ import annotations

import jax.numpy as jnp

from .group import batch_index_select, repeat_interleave
from .knn import knn


def compute_interp_weights(
    query: jnp.ndarray,
    key: jnp.ndarray,
    k: int = 3,
    eps: float = 1e-8,
    *,
    key_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-square-distance weights over the k nearest keys.

    Matches reference semantics (common.py:238-255): weight_i =
    (1 / max(d_i^2, eps)) normalized over the k neighbors. Our kNN already
    returns squared distances so no extra square is needed.

    Returns:
        (indices [B, Nq, k] int32, weights [B, Nq, k]).
    """
    import jax

    if (
        k == 3
        and key_valid is None
        and 128 <= key.shape[-2] <= 4096  # Mosaic lane-alignment floor
        and jax.default_backend() == "tpu"
    ):
        # Fused Pallas kernel: distance block + 3 min-extractions entirely
        # in VMEM (see ops.interp_pallas).
        from .interp_pallas import interp_weights_pallas

        try:
            return interp_weights_pallas(query, key, eps=eps)
        except Exception as exc:  # pragma: no cover - exercised on Mosaic regressions
            from ._warn import warn_fallback

            warn_fallback("ops.compute_interp_weights", exc)
    d2, idx = knn(query, key, k, key_valid=key_valid)
    inv = 1.0 / jnp.maximum(d2, eps)
    weight = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return idx, weight


def interpolate_features(
    x: jnp.ndarray, index: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted gather-sum: out[b, n] = sum_k w[b, n, k] * x[b, index[b, n, k]].

    Equivalent of reference interpolate_features (common.py:258-274).

    Args:
        x: [B, L, C] key features.
        index: [B, Nq, K] int indices into L.
        weight: [B, Nq, K] interpolation weights.

    Returns:
        [B, Nq, C].
    """
    gathered = batch_index_select(x, index, axis=1)  # [B, Nq, K, C]
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight.astype(gathered.dtype))


def interpolate_features_repeated(
    x: jnp.ndarray, index: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Like interpolate_features but x is [B*M, L, C] with [B, Nq, K] weights
    shared across the M mask replicas (reference: mask_decoder.py:158-163).

    The M replicas share indices, so they are folded into the channel axis
    and gathered in ONE pass ([B, L, M*C] rows) — TPU gather cost scales
    with row count, and this is the decoder's hot upscaling gather at
    [B*M, N] scale.
    """
    B = index.shape[0]
    repeats = x.shape[0] // B
    if repeats == 1:
        return interpolate_features(x, index, weight)
    L, C = x.shape[1:]
    x_ch = jnp.moveaxis(x.reshape(B, repeats, L, C), 1, 2).reshape(
        B, L, repeats * C
    )
    out = interpolate_features(x_ch, index, weight)  # [B, Nq, M*C]
    nq = out.shape[1]
    out = out.reshape(B, nq, repeats, C)
    return jnp.moveaxis(out, 2, 1).reshape(B * repeats, nq, C)
