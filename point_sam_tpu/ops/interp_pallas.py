"""Pallas TPU kernel for 3-NN interpolation weights.

Computes, for every point, its k=3 nearest patch centers and the
inverse-square-distance weights — the decoder's mask upsampler geometry
(reference mask_decoder.py:147-163). The XLA formulation round-trips the
[N, G] distance matrix through HBM once per argmin pass; here each query
tile's distance block lives entirely in VMEM: one MXU matmul for the cross
term, then three masked min/argmin extractions on the VPU, writing only the
[tile, 3] indices and weights back.

Shapes: queries [B, N, 3] against keys [B, G, 3] with G <= ~4096 (the key
set and one [tile_q, G] block must fit VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_K = 3


def tile_q_ok(g: int, tile_q: int) -> bool:
    """True if the [tile_q, G] fp32 distance block stays within 8 MB —
    the budget that leaves room for double-buffering under the 16 MB
    default scoped-VMEM limit."""
    return tile_q * g * 4 <= 8 * 2**20


def _interp_kernel(q_ref, k_ref, idx_ref, w_ref, *, g: int, eps: float):
    # q [1, tq, 3], k [1, G, 3] -> idx/w [1, tq, K]
    q = q_ref[0]  # [tq, 3]
    k = k_ref[0]  # [G, 3]
    # Explicit per-coordinate differences, NOT the q^2 - 2qk + k^2 matmul
    # expansion: with only 3 contraction dims the matmul saves nothing,
    # while the expansion cancels catastrophically for near neighbors
    # (exactly the ones being ranked) and Mosaic's default-precision fp32
    # dot adds bf16-pass noise on top — measured ~20% neighbor-order flips
    # vs exact distances at N=100k/G=2048 (tests/tpu_smoke.py).
    d2 = sum(
        (q[:, i:i + 1] - k[:, i:i + 1].T) ** 2 for i in range(3)
    )  # [tq, G], exact fp32

    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    ds = []
    idxs = []
    for _ in range(_K):
        m = jnp.min(d2, axis=-1, keepdims=True)
        i = jnp.min(jnp.where(d2 == m, iota, jnp.int32(2**30)), axis=-1,
                    keepdims=True)
        ds.append(m[:, 0])
        idxs.append(i[:, 0])
        d2 = jnp.where(iota == i, jnp.inf, d2)
    d = jnp.stack(ds, axis=-1)  # [tq, K]
    recip = 1.0 / jnp.maximum(d, eps)
    w = recip / jnp.sum(recip, axis=-1, keepdims=True)
    idx_ref[0] = jnp.stack(idxs, axis=-1)
    w_ref[0] = w


# eps is static: it must stay a python float, else the jit traces it to an
# abstract scalar that the kernel closure illegally captures (this silently
# forced the XLA fallback whenever the caller was itself under a jit).
@functools.partial(jax.jit, static_argnames=("eps", "tile_q", "interpret"))
def interp_weights_pallas(
    query: jnp.ndarray,
    key: jnp.ndarray,
    *,
    eps: float = 1e-8,
    # None = adaptive: 1024 rows while the [tile_q, G] fp32 distance block
    # stays <= 8 MB (kbench8 r5: 2.44 ms vs 2.73 at 512 for G=2048,
    # N=100k), else 512 (2048-row tiles OOM the 16 MB scoped VMEM).
    tile_q: int | None = None,
    interpret: bool = False,
):
    """(idx [B, N, 3] int32, weight [B, N, 3] f32); matches
    ops.compute_interp_weights semantics (first-index tie-breaking)."""
    B, N, _ = query.shape
    G = key.shape[1]
    if tile_q is None:
        tile_q = 1024 if tile_q_ok(G, 1024) else 512
    n_pad = -(-N // tile_q) * tile_q
    q = query.astype(jnp.float32)
    if n_pad != N:
        q = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0)))

    grid = (B, n_pad // tile_q)
    idx, w = pl.pallas_call(
        functools.partial(_interp_kernel, g=G, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, G, 3), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, _K), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile_q, _K), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, _K), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pad, _K), jnp.float32),
        ],
        interpret=interpret,
    )(q, key.astype(jnp.float32))
    return idx[:, :N], w[:, :N]
