"""Fused Pallas TPU kernel for the PointNet patch encoder.

The XLA lowering of the patch encoder (models/patch_encoder.py::PatchEncoder,
reference common.py:477-506) is HBM-bandwidth-bound: at the eval config
(G=2048 patches x K=256 neighbors) the [G*K, 512] hidden activations are
~0.5 GB per tensor and the Dense/LN/GELU chain round-trips several GB
through HBM — measured ~11 ms of the ~45 ms B=1 encode, against ~3 ms of
actual matmul FLOPs.

This kernel processes a tile of whole patches per grid cell and keeps every
intermediate in VMEM: for each tile of ``Tg`` patches (rows = Tg*K points)
it runs Dense -> LayerNorm -> GELU -> Dense, the K-axis max-pool, the
[pooled | pointwise] concat, the second Dense -> LN -> GELU -> Dense, and
the final max-pool — writing only the [Tg, C_out] patch embeddings back to
HBM. HBM traffic drops from ~gigabytes to (input + params + output), and
the stage becomes MXU-bound.

Numerics match the XLA module path: matmuls in the compute dtype with fp32
accumulation, LayerNorm statistics in fp32 (two-pass variance, eps 1e-5 —
torch-matched, see models/layers.py::LayerNorm), exact-erf GELU. ``erf`` is
not lowered by Mosaic, so the kernel evaluates the same single-precision
rational polynomial XLA/Eigen use (max |err| ~5e-7; bf16-bit-identical).

Differentiation: like ops/attention.py, the kernel is wrapped in a
``custom_vjp`` whose backward pass re-runs the plain-XLA reference
implementation under ``jax.vjp`` — training keeps exact autodiff semantics
while inference/eval get the fused forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def erf_f32(x):
    """Single-precision erf via the Eigen/XLA rational polynomial.

    Matches ``jax.lax.erf`` on fp32 to ~5e-7 (bit-identical after a cast to
    bf16); Mosaic does not lower the erf primitive, so the polynomial is
    inlined here.
    """
    t = jnp.clip(x, -4.0, 4.0)
    t2 = t * t
    a = jnp.float32(-2.72614225801306e-10)
    a = a * t2 + jnp.float32(2.77068142495902e-08)
    a = a * t2 + jnp.float32(-2.10102402082508e-06)
    a = a * t2 + jnp.float32(-5.69250639462346e-05)
    a = a * t2 + jnp.float32(-7.34990630326855e-04)
    a = a * t2 + jnp.float32(-2.95459980854025e-03)
    a = a * t2 + jnp.float32(-1.60960333262415e-02)
    a = a * t
    b = jnp.float32(-1.45660718464996e-05)
    b = b * t2 + jnp.float32(-2.13374055278905e-04)
    b = b * t2 + jnp.float32(-1.68282697438203e-03)
    b = b * t2 + jnp.float32(-7.37332916720468e-03)
    b = b * t2 + jnp.float32(-1.42647390514189e-02)
    return a / b


_SQRT_HALF = 0.7071067811865476


def _dense(x, w_ref, b_ref, cdt):
    """flax nn.Dense semantics: operands in compute dtype, fp32 MXU
    accumulation, result cast back, bias added in compute dtype."""
    y = jax.lax.dot_general(
        x.astype(cdt),
        w_ref[...].astype(cdt),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    return y + b_ref[...].astype(cdt)


def _layernorm(x, s_ref, b_ref, cdt):
    """models/layers.py::LayerNorm: fp32 stats, two-pass variance, eps 1e-5."""
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - m
    v = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + 1e-5)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    return y.astype(cdt)


def _gelu(x, cdt):
    """Exact-erf GELU (torch-matched; models/layers.py::_gelu_exact)."""
    x32 = x.astype(jnp.float32)
    y = x32 * 0.5 * (1.0 + erf_f32(x32 * _SQRT_HALF))
    return y.astype(cdt)


def _kernel(
    x_ref,
    w1a_ref, b1a_ref, s1_ref, t1_ref, w1b_ref, b1b_ref,
    w2a_ref, b2a_ref, s2_ref, t2_ref, w2b_ref, b2b_ref,
    o_ref,
    *, tg: int, k: int, cdt,
):
    x = x_ref[0]  # [Tg*K, C_in]
    h = _dense(x, w1a_ref, b1a_ref, cdt)
    h = _layernorm(h, s1_ref, t1_ref, cdt)
    h = _gelu(h, cdt)
    h = _dense(h, w1b_ref, b1b_ref, cdt)  # [Tg*K, H0]

    h0 = h.shape[-1]
    pooled = jnp.max(h.reshape(tg, k, h0), axis=1, keepdims=True)  # [Tg,1,H0]
    pooled = jnp.broadcast_to(pooled, (tg, k, h0)).reshape(tg * k, h0)
    h = jnp.concatenate([pooled, h], axis=-1)  # [Tg*K, 2*H0]

    h = _dense(h, w2a_ref, b2a_ref, cdt)
    h = _layernorm(h, s2_ref, t2_ref, cdt)
    h = _gelu(h, cdt)
    h = _dense(h, w2b_ref, b2b_ref, cdt)  # [Tg*K, C_out]

    co = h.shape[-1]
    o_ref[0] = jnp.max(h.reshape(tg, k, co), axis=1).astype(o_ref.dtype)


def _pick_tile(num_groups: int, group_size: int, rows_target: int = 4096) -> int:
    """Largest divisor of G with Tg*K <= rows_target (VMEM working set)."""
    tg = max(1, rows_target // group_size)
    while tg > 1 and num_groups % tg:
        tg -= 1
    return tg


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "group_size", "cdt", "rows_target",
                     "interpret"),
)
def patch_encoder_fused(
    grouped: jnp.ndarray,
    params: tuple,
    *,
    num_groups: int,
    group_size: int,
    cdt=jnp.bfloat16,
    rows_target: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused patch encoder forward.

    Args:
        grouped: [B, G*K, C_in] group features (models/patch_encoder.py
            input flattened over (G, K)).
        params: 12-tuple (w1a, b1a, ln1_scale, ln1_bias, w1b, b1b,
            w2a, b2a, ln2_scale, ln2_bias, w2b, b2b); matrices [in, out],
            vectors [H] (fp32 as stored).
        num_groups / group_size: static G and K.

    Returns: [B, G, C_out] patch embeddings in the compute dtype.
    """
    B = grouped.shape[0]
    G, K = num_groups, group_size
    if rows_target is None:
        # fp32 compute doubles every VMEM intermediate; halve the tile so
        # the working set stays inside the 16 MB scoped-vmem limit.
        rows_target = 4096 if jnp.dtype(cdt).itemsize <= 2 else 2048
    tg = _pick_tile(G, K, rows_target)
    rows = tg * K
    c_out = params[10].shape[1]

    vecs = tuple(
        p.reshape(1, -1) if p.ndim == 1 else p for p in params
    )
    full = lambda p: pl.BlockSpec(p.shape, lambda b, g: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_kernel, tg=tg, k=K, cdt=cdt),
        grid=(B, G // tg),
        in_specs=[
            pl.BlockSpec((1, rows, grouped.shape[-1]), lambda b, g: (b, g, 0)),
            *[full(p) for p in vecs],
        ],
        out_specs=pl.BlockSpec((1, tg, c_out), lambda b, g: (b, g, 0)),
        out_shape=jax.ShapeDtypeStruct((B, G, c_out), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(grouped, *vecs)


def patch_encoder_reference(grouped, params, *, num_groups, group_size, cdt):
    """Plain-XLA mirror of models/patch_encoder.py::PatchEncoder — used as
    the custom-VJP backward (activations recomputed, standard autodiff) and
    as the numerics oracle in tests."""
    (w1a, b1a, s1, t1, w1b, b1b, w2a, b2a, s2, t2, w2b, b2b) = params

    def dense(x, w, b):
        y = jax.lax.dot_general(
            x.astype(cdt), w.astype(cdt), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)
        return y + b.astype(cdt)

    def ln(x, s, t):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=-1, keepdims=True)
        c = x32 - m
        v = jnp.mean(c * c, axis=-1, keepdims=True)
        return ((c * jax.lax.rsqrt(v + 1e-5)) * s + t).astype(cdt)

    def gelu(x):
        x32 = x.astype(jnp.float32)
        return (x32 * 0.5 * (1.0 + jax.lax.erf(x32 * _SQRT_HALF))).astype(cdt)

    B = grouped.shape[0]
    x = grouped.reshape(B, num_groups, group_size, grouped.shape[-1])
    h = dense(x, w1a, b1a)
    h = gelu(ln(h, s1, t1))
    h = dense(h, w1b, b1b)
    pooled = jnp.max(h, axis=-2, keepdims=True)
    h = jnp.concatenate([jnp.broadcast_to(pooled, h.shape), h], axis=-1)
    h = dense(h, w2a, b2a)
    h = gelu(ln(h, s2, t2))
    h = dense(h, w2b, b2b)
    return jnp.max(h, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def patch_encoder_fused_ad(grouped, params, num_groups, group_size, cdt):
    """patch_encoder_fused with an XLA-recompute backward (Pallas kernels
    aren't reverse-mode differentiable under remat's partial evaluation —
    same pattern as ops/attention.py::mha_pallas_ad)."""
    return patch_encoder_fused(
        grouped, params, num_groups=num_groups, group_size=group_size, cdt=cdt
    )


def _fwd(grouped, params, num_groups, group_size, cdt):
    out = patch_encoder_fused(
        grouped, params, num_groups=num_groups, group_size=group_size, cdt=cdt
    )
    return out, (grouped, params)


def _bwd(num_groups, group_size, cdt, res, g):
    grouped, params = res
    _, vjp = jax.vjp(
        lambda x, p: patch_encoder_reference(
            x, p, num_groups=num_groups, group_size=group_size, cdt=cdt
        ),
        grouped,
        params,
    )
    return vjp(g.astype(cdt))


patch_encoder_fused_ad.defvjp(_fwd, _bwd)


def fused_dispatch_ok(num_groups: int, group_size: int, c_in: int) -> bool:
    """Static gate for the fused kernel: TPU backend, lane-friendly shapes,
    and a per-tile working set that fits VMEM."""
    if jax.default_backend() != "tpu":
        return False
    if group_size > 4096 or c_in > 128:
        return False
    tg = _pick_tile(num_groups, group_size)
    if (tg * group_size) % 8:
        return False
    # Mosaic block constraint: the [1, Tg, C_out] output block needs its
    # second-to-last dim divisible by 8 — unless the block spans all of G.
    if tg % 8 and tg != num_groups:
        return False
    return True
