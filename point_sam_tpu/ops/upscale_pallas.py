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
