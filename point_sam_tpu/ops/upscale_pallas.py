"""Fused mask-decoder upscale tail + hypernet dot (Pallas, TPU).

The decoder's per-point tail — LayerNorm -> GELU -> Dense -> GELU on the
[B*M, N, D] interpolated features, then the per-mask hypernet dot
(reference: mask_decoder.py:147-164 the interp-then-MLP upscaler,
:166-173 the ``(hyper_in @ upscaled)`` einsum) — is HBM-bound under XLA:
every stage round-trips the ~0.4 GB [B*M, N, D] activation through HBM
(at the eval config B*M=8, N=100k, D=256) while the actual matmul FLOPs
are ~1 ms of MXU time. This kernel streams N in VMEM tiles, reads the
interpolated features exactly ONCE, and emits only the [B*M, N, C] mask
logits (~40x smaller than the intermediates it replaces).

The upscale MLP's FIRST Dense is deliberately NOT in here: the 3-NN
interpolation weights sum to 1 (ops/interp.py::compute_interp_weights),
so ``Dense(interp(x)) == interp(Dense(x))`` in real arithmetic, and the
caller (models/mask_decoder.py) hoists that projection to the G-token
scale where it is ~N/G (≈50x) cheaper. The kernel input is therefore the
*already-projected* interpolated feature tensor.

Numerics match the XLA module path the same way the fused patch encoder
does (ops/patch_encoder_pallas.py): matmuls in the compute dtype with
fp32 MXU accumulation, fp32 two-pass LN stats (eps 1e-5), exact-erf GELU
via the inlined polynomial (Mosaic has no erf primitive), with the
LN->GELU pair fused in one fp32 region (one fewer bf16 rounding — see
_ln_gelu's note; asserted within 2e-2 rel on-chip by tests/tpu_smoke).

``upscale_hyper_ad`` wraps the kernel in a custom VJP whose backward
recomputes the plain-XLA reference under ``jax.vjp`` — so in training the
forward doubles as rematerialization: none of the [B*M, N, D]
intermediates are saved as residuals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .patch_encoder_pallas import _dense, _gelu, _ln_gelu


def _pick_tile_n(n: int, rows_target: int = 4096) -> int:
    """Largest divisor of N that is %8 and <= rows_target (0 if none)."""
    start = min(rows_target, n)
    start -= start % 8
    for t in range(start, 0, -8):
        if n % t == 0:
            return t
    return 0


def _kernel(x_ref, s_ref, t_ref, w_ref, b_ref, h_ref, o_ref, *, cdt):
    x = x_ref[0]  # [T, D] interpolated (projected) features
    g = _ln_gelu(x, s_ref, t_ref, cdt)  # LN (fp32 stats) -> exact GELU
    h = _gelu(_dense(g, w_ref, b_ref, cdt), cdt)  # [T, D]
    hyper = h_ref[0]  # [C, D] per-mask hypernet outputs
    # [T, D] x [C, D]^T on the MXU; fp32 accumulation like the module
    # einsum (mask logits are fp32 by contract).
    o = jax.lax.dot_general(
        h.astype(cdt),
        hyper.astype(cdt),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, C]
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("cdt", "rows_target", "interpret")
)
def upscale_hyper_fused(
    x: jnp.ndarray,
    params: tuple,
    hyper: jnp.ndarray,
    *,
    cdt=jnp.bfloat16,
    rows_target: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused LN -> GELU -> Dense -> GELU -> hypernet-dot forward.

    Args:
        x: [BM, N, D] 3-NN-interpolated, Dense_0-projected features.
        params: (ln_scale [D], ln_bias [D], w2 [D, D], b2 [D]) — the
            OutputUpscaling LayerNorm_0 + Dense_1 parameters (fp32).
        hyper: [BM, C, D] hypernetwork MLP outputs for the selected mask
            tokens.

    Returns: mask logits [BM, C, N] fp32.
    """
    BM, N, D = x.shape
    C = hyper.shape[1]
    t = _pick_tile_n(N, rows_target)
    if not t:
        raise ValueError(f"no %8 tile divides N={N}")
    s, tt, w, b = params
    vecs = (s.reshape(1, -1), tt.reshape(1, -1), w, b.reshape(1, -1))
    full = lambda p: pl.BlockSpec(p.shape, lambda bm, n: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_kernel, cdt=cdt),
        grid=(BM, N // t),
        in_specs=[
            pl.BlockSpec((1, t, D), lambda bm, n: (bm, n, 0)),
            *[full(p) for p in vecs],
            # [1, C, D]: C spans its full axis (C is 1 or 3-4, not %8).
            pl.BlockSpec((1, C, D), lambda bm, n: (bm, 0, 0)),
        ],
        # [1, T, C]: lanes = C spans the full axis; the [BM, C, N] layout
        # is impossible here (no 128-multiple tile divides N=100k), so the
        # kernel emits [BM, N, C] and the caller transposes the small
        # logits tensor.
        out_specs=pl.BlockSpec((1, t, C), lambda bm, n: (bm, n, 0)),
        out_shape=jax.ShapeDtypeStruct((BM, N, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=interpret,
    )(x, *vecs, hyper)
    return jnp.swapaxes(out, 1, 2)


def upscale_hyper_reference(x, params, hyper, *, cdt):
    """Plain-XLA chain matching the module path bit-for-bit
    (models/mask_decoder.py::OutputUpscaling.finish + the hypernet einsum):
    LN with fp32 two-pass stats cast to cdt, exact-erf GELU, Dense in cdt,
    GELU, einsum with fp32 accumulation."""
    s, t, w, b = params
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    d = x32 - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + 1e-5) * s + t
    y = jax.nn.gelu(y.astype(cdt), approximate=False)
    h = jnp.dot(y.astype(cdt), w.astype(cdt)) + b.astype(cdt)
    h = jax.nn.gelu(h, approximate=False)
    return jnp.einsum(
        "bcd,bnd->bcn",
        hyper.astype(cdt),
        h,
        preferred_element_type=jnp.float32,
    )


def upscale_dispatch_ok(n: int, d: int, c: int, cdt=jnp.bfloat16) -> bool:
    """Static gate: TPU backend, MXU-friendly feature width, a valid %8
    tile over N, and a lane-size C the [1, C, D] hyper block can span."""
    if jax.default_backend() != "tpu":
        return False
    if d % 128 or d > 1024 or c > 8:
        return False
    return _pick_tile_n(n) > 0


# ============================================== interp-fused variant (v2)
#
# kbench7 (r4, real chip): the XLA 3-NN gather+weighted-sum alone costs
# 11.5 ms at the decode shape — 2x the whole fused tail (5.7 ms). TPU
# gathers are row-rate/HBM-bound: [B, N, 3] indices pulling 4 KB rows of
# the M-folded [B, G, M*D] table materialize ~1.2 GB of intermediate.
# This variant instead builds each query tile's sparse interpolation
# matrix W [T, G] (three weighted one-hots, pure VPU compares) in VMEM
# and computes interp = W @ h1 on the MXU — 680x the minimal gather
# FLOPs, but MXU FLOPs are ~3x faster than the gather's effective HBM
# rate here, and the [B*M, N, D] interp tensor never exists in HBM at
# all. Total HBM traffic: idx/w + the G-token tables + the [BM, C, N]
# logits ≈ 25 MB (vs ~2 GB for gather + XLA tail).
#
# The iota shape [512, G<=2048] is the same one ops/interp_pallas.py has
# run on-chip since r2 (the known Mosaic iota crash is at [512, 4096]).


def _kernel_interp(
    idx_ref, w_ref, h1_ref, s_ref, t_ref, w2_ref, b2_ref, hy_ref, o_ref,
    *, g: int, m: int, cdt,
):
    idx = idx_ref[0]  # [T, 3] int32 (3-NN center indices)
    wts = w_ref[0]  # [T, 3] f32 (normalized inverse-d2 weights)
    t_rows = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t_rows, g), 1)
    # Sparse interp matrix as three weighted one-hots. Duplicate indices
    # (degenerate neighbor ties) ADD, matching the gather-sum semantics.
    # Built ONCE per cloud tile and reused by all M mask replicas (the
    # grid batches M into the block): the build is ~6 VPU passes over
    # [T, G] — per-replica it was ~25% of the kernel.
    wmat = sum(
        (iota == idx[:, k:k + 1]).astype(jnp.float32) * wts[:, k:k + 1]
        for k in range(3)
    ).astype(cdt)  # [T, G]
    for j in range(m):  # static unroll over the mask replicas
        x = jax.lax.dot_general(
            wmat, h1_ref[j].astype(cdt),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)  # [T, D] == interp(h1[j])
        gl = _ln_gelu(x, s_ref, t_ref, cdt)
        h = _gelu(_dense(gl, w2_ref, b2_ref, cdt), cdt)
        o = jax.lax.dot_general(
            hy_ref[j].astype(cdt), h.astype(cdt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, T] — T=512 lanes are 128-aligned (the [T, C] layout
        # wastes 125/128 store lanes)
        o_ref[j] = o.astype(o_ref.dtype)


_TILE2 = 512  # iota [512, G<=2048] is the on-chip-proven shape


@functools.partial(jax.jit, static_argnames=("cdt", "interpret"))
def interp_upscale_hyper_fused(
    h1: jnp.ndarray,
    index: jnp.ndarray,
    weight: jnp.ndarray,
    params: tuple,
    hyper: jnp.ndarray,
    *,
    cdt=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """3-NN interp + LN -> GELU -> Dense -> GELU -> hypernet-dot, fused.

    Args:
        h1: [BM, G, D] Dense_0-projected pc tokens (BM = B*M replicas).
        index/weight: [B, N, 3] cached 3-NN geometry, shared across the M
            mask replicas of each cloud.
        params: (ln_scale, ln_bias, w2, b2) as in upscale_hyper_fused.
        hyper: [BM, C, D].

    Returns: mask logits [BM, C, N] fp32.
    """
    BM, G, D = h1.shape
    B, N = index.shape[:2]
    M = BM // B
    C = hyper.shape[1]
    t = _TILE2
    n_pad = -(-N // t) * t
    if n_pad != N:
        # Pad with idx 0 / weight 0: padded rows produce finite garbage
        # (LN of the zero vector) that the final slice drops.
        index = jnp.pad(index, ((0, 0), (0, n_pad - N), (0, 0)))
        weight = jnp.pad(weight, ((0, 0), (0, n_pad - N), (0, 0)))
    s, tt, w, b = params
    vecs = (s.reshape(1, -1), tt.reshape(1, -1), w, b.reshape(1, -1))
    full = lambda p: pl.BlockSpec(p.shape, lambda bm, n: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_kernel_interp, g=G, m=M, cdt=cdt),
        grid=(B, n_pad // t),
        in_specs=[
            pl.BlockSpec((1, t, 3), lambda b, n: (b, n, 0)),
            pl.BlockSpec((1, t, 3), lambda b, n: (b, n, 0)),
            # All M replica tables in one block, constant over the inner
            # grid axis: stays VMEM-resident across a cloud's N tiles.
            pl.BlockSpec((M, G, D), lambda b, n: (b, 0, 0)),
            *[full(p) for p in vecs],
            pl.BlockSpec((M, C, D), lambda b, n: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, C, t), lambda b, n: (b, 0, n)),
        out_shape=jax.ShapeDtypeStruct((BM, C, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=interpret,
    )(index.astype(jnp.int32), weight.astype(jnp.float32), h1, *vecs, hyper)
    return out[..., :N]


def interp_upscale_dispatch_ok(n: int, g: int, d: int, c: int,
                               cdt=jnp.bfloat16, m: int = 1) -> bool:
    """Static gate for the interp-fused kernel: TPU backend, the proven
    iota width (G <= 2048), MXU-friendly D, small C, and all M replica
    tables fitting the VMEM block budget."""
    if jax.default_backend() != "tpu":
        return False
    if g > 2048 or g % 128 or d % 128 or d > 1024 or c > 8:
        return False
    # Whole-working-set VMEM budget (ADVICE r4: the h1 block alone is not
    # the footprint). Per grid step the kernel holds: the M replica tables
    # (+ pipeline double-buffer), the fp32 one-hot W and its iota/compare
    # temps at [T, G], the hyper block, ~4 fp32 [T, D] tail intermediates
    # and the [M, C, T] out block. Cap the estimate at 75% of the 96 MB
    # vmem_limit_bytes so Mosaic allocation can never fail at the gate's
    # edge (a crash there can wedge the remote TPU tunnel, CLAUDE.md).
    ib = jnp.dtype(cdt).itemsize
    t = _TILE2
    est = (
        2 * m * g * d * ib          # h1 block, double-buffered
        + t * g * (4 + 4 + ib)      # iota + fp32 one-hot accum + cdt W
        + 2 * m * c * d * 4         # hyper block, double-buffered
        + 4 * t * d * 4             # x/gl/h + LN temps (fp32)
        + 2 * m * c * t * 4         # out block, double-buffered
    )
    if est > 72 * 2**20:
        return False
    return n >= 8


def interp_upscale_reference(h1, index, weight, params, hyper, *, cdt):
    """XLA chain for the backward recompute: gather-interp (the module
    path, ops/interp.py::interpolate_features_repeated) + the upscale
    tail reference."""
    from .interp import interpolate_features_repeated

    x = interpolate_features_repeated(h1, index, weight)
    return upscale_hyper_reference(x, params, hyper, cdt=cdt)


def interp_matrix(index, weight, g: int):
    """Dense interpolation matrix W [B, N, G]: three weighted one-hots
    (duplicate indices ADD — gather-sum semantics, same construction as
    the fused kernel's in-VMEM wmat)."""
    iota = jnp.arange(g, dtype=index.dtype)
    return sum(
        (index[..., k, None] == iota) * weight[..., k, None]
        for k in range(3)
    )


# Use the matmul-form recompute in the backward when the dense [B, N, G]
# interp matrix stays modest (64 MB fp32 per batch row at the cap). Covers
# the TRAIN shape (N=10k x G=1024 = 10M) where it matters; giant eval
# shapes fall back to the gather form (they never backprop).
_BWD_MATMUL_MAX_ELEMENTS = 1 << 24


def interp_upscale_reference_matmul(h1, index, weight, params, hyper, *,
                                    cdt):
    """interp_upscale_reference with the 3-NN gather-sum expressed as a
    dense [N, G] matmul (VERDICT r4 #4). Same values up to fp32 summation
    order; the payoff is the BACKWARD: jax.vjp of a gather emits a TPU
    scatter-add over the [B*M, N, 3, D] cotangents (the dominant
    decode-tail cost in the train step), while the vjp of this form is
    dh1 = W^T @ dx — a plain MXU matmul."""
    BM, G, D = h1.shape
    B, N = index.shape[:2]
    M = BM // B
    wmat = interp_matrix(index, weight, G).astype(cdt)  # [B, N, G]
    x = jnp.einsum(
        "bng,bmgd->bmnd", wmat,
        h1.reshape(B, M, G, D).astype(cdt),
    ).reshape(BM, N, D)
    return upscale_hyper_reference(x, params, hyper, cdt=cdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def interp_upscale_hyper_ad(h1, index, weight, params, hyper, cdt):
    """interp_upscale_hyper_fused with an XLA-recompute backward. The
    geometry (index/weight) is stop-gradient by contract (tokenizer
    geometry); its cotangents are zero."""
    return interp_upscale_hyper_fused(h1, index, weight, params, hyper,
                                      cdt=cdt)


def _fwd2(h1, index, weight, params, hyper, cdt):
    out = interp_upscale_hyper_fused(h1, index, weight, params, hyper,
                                     cdt=cdt)
    return out, (h1, index, weight, params, hyper)


def _bwd2(cdt, res, g):
    import numpy as np

    h1, index, weight, params, hyper = res
    n, g_tokens = index.shape[1], h1.shape[1]
    ref = (
        interp_upscale_reference_matmul
        if n * g_tokens <= _BWD_MATMUL_MAX_ELEMENTS
        else interp_upscale_reference
    )
    _, vjp = jax.vjp(
        lambda h_, p_, hy_: ref(
            h_, index, weight, p_, hy_, cdt=cdt),
        h1, params, hyper,
    )
    dh1, dparams, dhyper = vjp(g)
    # index is integer -> float0 cotangent; weight is stop-gradient
    # geometry by contract -> zeros.
    didx = np.zeros(index.shape, dtype=jax.dtypes.float0)
    return dh1, didx, jnp.zeros_like(weight), dparams, dhyper


interp_upscale_hyper_ad.defvjp(_fwd2, _bwd2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def upscale_hyper_ad(x, params, hyper, cdt):
    """upscale_hyper_fused with an XLA-recompute backward (Pallas kernels
    aren't reverse-mode differentiable; same pattern as
    patch_encoder_fused_ad). Under training the forward acts as remat —
    no [BM, N, D] residuals are saved."""
    return upscale_hyper_fused(x, params, hyper, cdt=cdt)


def _fwd(x, params, hyper, cdt):
    return upscale_hyper_fused(x, params, hyper, cdt=cdt), (x, params, hyper)


def _bwd(cdt, res, g):
    x, params, hyper = res
    _, vjp = jax.vjp(
        lambda x_, p_, h_: upscale_hyper_reference(x_, p_, h_, cdt=cdt),
        x, params, hyper,
    )
    return vjp(g)


upscale_hyper_ad.defvjp(_fwd, _bwd)
