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


def _ln_gelu(x, s_ref, b_ref, cdt, act: str = "erf"):
    """LayerNorm -> GELU in ONE fp32 region.

    The separate _layernorm/_gelu pair casts fp32->cdt->fp32 between the
    two ops — at the eval config that intermediate round trip alone is
    ~0.7 ms of pure VPU cast traffic (measured, round 3). In fp32 compute
    the fusion is bit-identical (the casts were no-ops); in bf16 it skips
    one rounding of the GELU input — well inside the kernel's bf16
    tolerance (tests/tpu_smoke.py, 2e-2) and unobservable after the final
    cast in practice.

    ``act="tanh"``: LN stats stay fp32 (framework convention), but the
    scale/bias apply and the tanh-approx GELU run in the compute dtype —
    the kbench5 r5 operating point (5.46 ms vs 7.17 erf at the eval
    config; the erf polynomial + fp32 apply is ~1.7 ms of pure VPU time).
    The tanh approximation deviates from exact GELU by <= ~3e-4 — an
    order of magnitude below one bf16 ulp of the activations it feeds —
    and is the same approximation torch exposes as
    ``nn.GELU(approximate='tanh')``."""
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - m
    v = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(v + 1e-5)
    if act == "tanh":
        yc = (y.astype(cdt) * s_ref[...].astype(cdt)
              + b_ref[...].astype(cdt))
        return jax.nn.gelu(yc, approximate=True)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    # NOTE: the unfused module path rounds the LN output to cdt before GELU;
    # this fusion keeps full fp32 into the GELU (one fewer bf16 rounding).
    # In fp32 compute it is bit-identical; in bf16 the divergence is one
    # input ulp through a 1-Lipschitz activation — far inside the kernel's
    # bf16 tolerance (tests/tpu_smoke.py asserts 2e-2 rel).
    out = y * 0.5 * (1.0 + erf_f32(y * _SQRT_HALF))
    return out.astype(cdt)


def _kernel(
    x_ref,
    w1a_ref, b1a_ref, s1_ref, t1_ref, w1b_ref, b1b_ref,
    w2a_ref, b2a_ref, s2_ref, t2_ref, w2b_ref, b2b_ref,
    o_ref,
    *, tg: int, k: int, cdt, act: str = "erf",
):
    x = x_ref[0]  # [Tg*K, C_in]
    h = _dense(x, w1a_ref, b1a_ref, cdt)
    h = _ln_gelu(h, s1_ref, t1_ref, cdt, act)
    h = _dense(h, w1b_ref, b1b_ref, cdt)  # [Tg*K, H0]

    h0 = h.shape[-1]
    # Stage-2 first Dense on the concat [pooled | h] split into two matmuls:
    # the pooled half is constant over K, so its contribution is a [Tg, H1]
    # matmul broadcast-added instead of a [Tg*K, H0]@[H0, H1] — saves half
    # of this stage's FLOPs and the materialized broadcast+concat.
    pooled = jnp.max(h.reshape(tg, k, h0), axis=1)  # [Tg, H0]
    w2 = w2a_ref[...]
    up_pool = jax.lax.dot_general(
        pooled.astype(cdt), w2[:h0].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [Tg, H1] fp32
    up_pt = jax.lax.dot_general(
        h.astype(cdt), w2[h0:].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [Tg*K, H1] fp32
    h1 = up_pt.shape[-1]
    h = (
        (up_pt.reshape(tg, k, h1) + up_pool[:, None, :]).reshape(tg * k, h1)
    ).astype(cdt) + b2a_ref[...].astype(cdt)

    h = _ln_gelu(h, s2_ref, t2_ref, cdt, act)
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
                     "act", "interpret"),
)
def patch_encoder_fused(
    grouped: jnp.ndarray,
    params: tuple,
    *,
    num_groups: int,
    group_size: int,
    cdt=jnp.bfloat16,
    rows_target: int | None = None,
    act: str = "erf",
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
        # 2048 beats 4096/8192 at the eval config (kbench5 r4: 6.47 vs
        # 7.38/6.89 ms) — the smaller working set double-buffers better
        # against the input-block streaming. fp32 compute doubles every
        # VMEM intermediate; same tile keeps it inside the scoped limit.
        rows_target = 2048
    tg = _pick_tile(G, K, rows_target)
    rows = tg * K
    c_out = params[10].shape[1]

    vecs = tuple(
        p.reshape(1, -1) if p.ndim == 1 else p for p in params
    )
    if jnp.dtype(cdt).itemsize == 2:
        # Stream weight MATRICES at the compute dtype (half the param HBM
        # traffic; kbench5 params_bf16). Numerics identical: the kernel
        # casts matmul operands to cdt anyway. LN scale/bias and biases
        # stay fp32 (applied in fp32 inside _ln_gelu).
        vecs = tuple(
            p.astype(cdt) if p.ndim == 2 and p.shape[0] > 1 else p
            for p in vecs
        )
    full = lambda p: pl.BlockSpec(p.shape, lambda b, g: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_kernel, tg=tg, k=K, cdt=cdt, act=act),
        grid=(B, G // tg),
        in_specs=[
            pl.BlockSpec((1, rows, grouped.shape[-1]), lambda b, g: (b, g, 0)),
            *[full(p) for p in vecs],
        ],
        out_specs=pl.BlockSpec((1, tg, c_out), lambda b, g: (b, g, 0)),
        out_shape=jax.ShapeDtypeStruct((B, G, c_out), cdt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # allow tiles past the 16 MB default scoped budget (v5e: 128 MB)
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=interpret,
    )(grouped, *vecs)


def grad_safe_max(x, axis=-2, keepdims=False):
    """``jnp.max`` with the gradient routed through argmax + gather.

    XLA:TPU's fused gradient of two chained ``reduce_max`` ops in one
    backward program emits NaN parameter gradients at this module's exact
    shape (bf16 recompute of the pooled value inside the fused tie-split
    max-grad divides 0/0 — reproduced on v5e, 2026-08; tests/tpu_smoke.py
    guards it). Forward value is identical; the gradient routes to the
    FIRST maximal element, which is also torch's ``max`` backward semantic
    (the reference trains through torch.max at common.py:499-505).
    """
    idx = jnp.argmax(x, axis=axis)
    out = jnp.take_along_axis(x, jnp.expand_dims(idx, axis), axis=axis)
    return out if keepdims else jnp.squeeze(out, axis)


def patch_encoder_reference(grouped, params, *, num_groups, group_size, cdt,
                            act: str = "erf"):
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
        if act == "tanh":
            return jax.nn.gelu(x, approximate=True)  # stays in cdt
        x32 = x.astype(jnp.float32)
        return (x32 * 0.5 * (1.0 + jax.lax.erf(x32 * _SQRT_HALF))).astype(cdt)

    B = grouped.shape[0]
    x = grouped.reshape(B, num_groups, group_size, grouped.shape[-1])
    h = dense(x, w1a, b1a)
    h = gelu(ln(h, s1, t1))
    h = dense(h, w1b, b1b)
    pooled = grad_safe_max(h, axis=-2, keepdims=True)
    h = jnp.concatenate([jnp.broadcast_to(pooled, h.shape), h], axis=-1)
    h = dense(h, w2a, b2a)
    h = gelu(ln(h, s2, t2))
    h = dense(h, w2b, b2b)
    return grad_safe_max(h, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def patch_encoder_fused_ad(grouped, params, num_groups, group_size, cdt,
                           act="erf"):
    """patch_encoder_fused with an XLA-recompute backward (Pallas kernels
    aren't reverse-mode differentiable under remat's partial evaluation —
    same pattern as ops/attention.py::mha_pallas_ad)."""
    return patch_encoder_fused(
        grouped, params, num_groups=num_groups, group_size=group_size,
        cdt=cdt, act=act
    )


def _fwd(grouped, params, num_groups, group_size, cdt, act):
    out = patch_encoder_fused(
        grouped, params, num_groups=num_groups, group_size=group_size,
        cdt=cdt, act=act
    )
    return out, (grouped, params)


def _bwd(num_groups, group_size, cdt, act, res, g):
    grouped, params = res
    # The fused Pallas backward when shapes/dtype allow (bf16 TPU path);
    # otherwise recompute-and-vjp through the XLA reference.
    if (
        jnp.dtype(cdt).itemsize <= 2
        and fused_bwd_ok(num_groups, group_size, grouped.shape[-1])
    ):
        dx, dparams = patch_encoder_fused_bwd(
            grouped, params, g, num_groups=num_groups,
            group_size=group_size, cdt=cdt, act=act,
        )
        dparams = tuple(
            dp.astype(p.dtype) for dp, p in zip(dparams, params)
        )
        return dx, dparams
    _, vjp = jax.vjp(
        lambda x, p: patch_encoder_reference(
            x, p, num_groups=num_groups, group_size=group_size, cdt=cdt,
            act=act
        ),
        grouped,
        params,
    )
    return vjp(g.astype(cdt))


patch_encoder_fused_ad.defvjp(_fwd, _bwd)


def _tile_ok(num_groups: int, group_size: int, rows_target: int) -> bool:
    """Mosaic block constraints for a given tile budget: rows divisible by
    8, and the [1, Tg, C] blocks need Tg % 8 == 0 unless Tg spans all of G."""
    tg = _pick_tile(num_groups, group_size, rows_target)
    if (tg * group_size) % 8:
        return False
    if tg % 8 and tg != num_groups:
        return False
    return True


def fused_dispatch_ok(num_groups: int, group_size: int, c_in: int,
                      cdt=jnp.bfloat16) -> bool:
    """Static gate for the fused FORWARD at compute dtype ``cdt``: TPU
    backend, lane-friendly shapes, and a valid tile at the dtype's
    rows_target (fp32 halves the tile — the constraint must be checked at
    the tile actually used, not the bf16 default)."""
    if jax.default_backend() != "tpu":
        return False
    if group_size > 4096 or c_in > 128:
        return False
    rows_target = 4096 if jnp.dtype(cdt).itemsize <= 2 else 2048
    return _tile_ok(num_groups, group_size, rows_target)


def fused_bwd_ok(num_groups: int, group_size: int, c_in: int) -> bool:
    """Static gate for the fused BACKWARD (bf16 only; rows_target 2048)."""
    if jax.default_backend() != "tpu":
        return False
    if group_size > 4096 or c_in > 128:
        return False
    return _tile_ok(num_groups, group_size, 2048)


# ===================================================== fused backward pass
#
# The custom-VJP backward originally re-ran the plain-XLA reference under
# jax.vjp — correct, but HBM-bound exactly like the XLA forward (~3x the
# fused forward's time), and the TRAIN step pays it 5x per step (main patch
# embed + the mask prompt encoder in every refinement iteration). This
# kernel recomputes the forward intermediates per patch tile in VMEM and
# chains the backward in-kernel; parameter gradients accumulate across the
# sequential grid in the output refs.


def _gelu_grad_f32(z32):
    """d/dz [z * Phi(z)] = Phi(z) + z * phi(z), exact-erf GELU."""
    phi_cdf = 0.5 * (1.0 + erf_f32(z32 * _SQRT_HALF))
    pdf = jnp.exp(-0.5 * z32 * z32) * jnp.float32(0.3989422804014327)
    return phi_cdf + z32 * pdf


_GELU_C0 = 0.7978845608028654  # sqrt(2/pi)
_GELU_C1 = 0.044715


def _gelu_grad_tanh_f32(z32):
    """d/dz of the tanh-approx GELU 0.5*z*(1 + tanh(c0*(z + c1*z^3)))."""
    z2 = z32 * z32
    u = jnp.float32(_GELU_C0) * (z32 + jnp.float32(_GELU_C1) * z32 * z2)
    t = jnp.tanh(u)
    du = jnp.float32(_GELU_C0) * (1.0 + 3.0 * jnp.float32(_GELU_C1) * z2)
    return 0.5 * (1.0 + t) + 0.5 * z32 * (1.0 - t * t) * du


def _ln_fwd_stats(a, s_ref, t_ref):
    """Returns (y_fp32, mean, inv_std) with fp32 two-pass stats.

    fp32 output (no cdt round trip) to match the forward kernel's fused
    _ln_gelu — the backward's recompute must reproduce the forward's
    numerics choices, and the saved cast pair is the same ~VPU win."""
    x32 = a.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - m
    v = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(v + 1e-5)
    y = (c * inv) * s_ref[...].astype(jnp.float32) + t_ref[...].astype(
        jnp.float32
    )
    return y, m, inv


def _ln_bwd(dy32, a, m, inv, s_ref):
    """LN backward for y = xhat*s+t, xhat = (a-m)*inv (fp32 stats).

    Returns (da32, ds, dt) with ds/dt summed over rows.
    """
    xhat = (a.astype(jnp.float32) - m) * inv
    s = s_ref[...].astype(jnp.float32)
    dxhat = dy32 * s
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    da = inv * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    ds = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    dt = jnp.sum(dy32, axis=0, keepdims=True)
    return da, ds, dt


def _maxpool_bwd(dpool32, a, tg, k):
    """Backward of max over the K axis: grad routed to the FIRST maximal
    element — torch ``max`` semantics (the reference trains through
    torch.max, common.py:499-505) and what grad_safe_max/the XLA-recompute
    fallback compute. In bf16, quantization ties are common (several of
    256 rows round to the same max), so tie ROUTING is part of numerics
    parity, not a corner case. dpool32 [Tg, C] -> [Tg*K, C]."""
    c = a.shape[-1]
    # fp32 compare: Mosaic has no bf16 cmpf, and the upcast is exact.
    a3 = a.astype(jnp.float32).reshape(tg, k, c)
    mx = jnp.max(a3, axis=1, keepdims=True)
    eq = a3 == mx
    # First-occurrence one-hot via a min over masked row indices (cheap
    # VPU compare/min; Mosaic-friendly, no cumsum).
    ii = jax.lax.broadcasted_iota(jnp.int32, (tg, k, c), 1)
    fmin = jnp.min(jnp.where(eq, ii, k), axis=1, keepdims=True)
    da = (ii == fmin).astype(jnp.float32) * dpool32[:, None, :]
    return da.reshape(tg * k, c)


def _dot_f32(x, y, dims):
    return jax.lax.dot_general(x, y, dims,
                               preferred_element_type=jnp.float32)


def _bwd_kernel(
    x_ref,
    w1a_ref, b1a_ref, s1_ref, t1_ref, w1b_ref, b1b_ref,
    w2a_ref, b2a_ref, s2_ref, t2_ref, w2b_ref, b2b_ref,
    do_ref,
    dx_ref,
    dw1a_ref, db1a_ref, ds1_ref, dt1_ref, dw1b_ref, db1b_ref,
    dw2a_ref, db2a_ref, ds2_ref, dt2_ref, dw2b_ref, db2b_ref,
    *, tg: int, k: int, cdt, act: str = "erf",
):
    if act == "tanh":
        # fp32 recompute of the tanh-approx GELU; the forward's extra cdt
        # rounding of the LN apply is one activation ulp — inside the
        # backward's own recompute tolerance (tests compare vs jax.vjp of
        # the reference at bf16 tolerances).
        def _act(y32):
            u = jnp.float32(_GELU_C0) * (
                y32 + jnp.float32(_GELU_C1) * y32 * y32 * y32)
            return (0.5 * y32 * (1.0 + jnp.tanh(u))).astype(cdt)

        _act_grad = _gelu_grad_tanh_f32
    else:
        def _act(y32):
            return (y32 * 0.5 * (1.0 + erf_f32(y32 * _SQRT_HALF))).astype(cdt)

        _act_grad = _gelu_grad_f32

    # ---- forward recompute (identical math to _kernel, incl. the fused
    # LN->GELU fp32 region and the pooled-branch matmul split)
    x = x_ref[0]
    a1 = _dense(x, w1a_ref, b1a_ref, cdt)
    l1_32, m1, inv1 = _ln_fwd_stats(a1, s1_ref, t1_ref)
    g1 = _act(l1_32)
    a2 = _dense(g1, w1b_ref, b1b_ref, cdt)  # [R, H0]

    h0 = a2.shape[-1]
    pool = jnp.max(a2.reshape(tg, k, h0), axis=1)  # [Tg, H0]
    w2 = w2a_ref[...]
    w2_pool = w2[:h0].astype(cdt)
    w2_pt = w2[h0:].astype(cdt)
    _mm = (((1,), (0,)), ((), ()))
    up_pool = _dot_f32(pool.astype(cdt), w2_pool, _mm)  # [Tg, H1]
    up_pt = _dot_f32(a2, w2_pt, _mm)  # [R, H1]
    h1 = up_pt.shape[-1]
    a3 = (
        (up_pt.reshape(tg, k, h1) + up_pool[:, None, :]).reshape(tg * k, h1)
    ).astype(cdt) + b2a_ref[...].astype(cdt)
    l3_32, m3, inv3 = _ln_fwd_stats(a3, s2_ref, t2_ref)
    g3 = _act(l3_32)
    a4 = _dense(g3, w2b_ref, b2b_ref, cdt)  # [R, C_out]

    # ---- backward
    do32 = do_ref[0].astype(jnp.float32)  # [Tg, C_out]
    da4 = _maxpool_bwd(do32, a4, tg, k)  # [R, C_out] f32
    da4c = da4.astype(cdt)

    dw2b = _dot_f32(g3, da4c, (((0,), (0,)), ((), ())))  # [H1, C_out]
    db2b = jnp.sum(da4, axis=0, keepdims=True)
    dg3 = _dot_f32(da4c, w2b_ref[...].astype(cdt),
                   (((1,), (1,)), ((), ())))  # [R, H1] f32
    dl3 = dg3 * _act_grad(l3_32)
    da3_32, ds2, dt2 = _ln_bwd(dl3, a3, m3, inv3, s2_ref)
    da3 = da3_32.astype(cdt)

    # Pooled-branch split backward: a3 = pool@Wp + a2@Wx + b, so
    #   da2  = da3@Wx^T + maxpool_bwd((sum_K da3)@Wp^T)
    #   dWp  = pool^T @ (sum_K da3)   [Tg-row matmul, not R-row]
    #   dWx  = a2^T @ da3
    # — same values as the concat form (sum reordering only), at half the
    # R-row matmul FLOPs and no materialized [R, 2*H0] concat.
    da3_sum = jnp.sum(
        da3_32.reshape(tg, k, h1), axis=1).astype(cdt)  # [Tg, H1]
    dw2a_pool = _dot_f32(pool.astype(cdt), da3_sum,
                         (((0,), (0,)), ((), ())))  # [H0, H1]
    dw2a_pt = _dot_f32(a2, da3, (((0,), (0,)), ((), ())))  # [H0, H1]
    dw2a = jnp.concatenate([dw2a_pool, dw2a_pt], axis=0)  # [2*H0, H1]
    db2a = jnp.sum(da3_32, axis=0, keepdims=True)

    dpool = _dot_f32(da3_sum, w2_pool, (((1,), (1,)), ((), ())))  # [Tg, H0]
    da2 = (
        _dot_f32(da3, w2_pt, (((1,), (1,)), ((), ())))
        + _maxpool_bwd(dpool, a2, tg, k)
    )
    da2c = da2.astype(cdt)

    dw1b = _dot_f32(g1, da2c, (((0,), (0,)), ((), ())))
    db1b = jnp.sum(da2, axis=0, keepdims=True)
    dg1 = _dot_f32(da2c, w1b_ref[...].astype(cdt),
                   (((1,), (1,)), ((), ())))
    dl1 = dg1 * _act_grad(l1_32)
    da1_32, ds1, dt1 = _ln_bwd(dl1, a1, m1, inv1, s1_ref)
    da1 = da1_32.astype(cdt)

    dw1a = _dot_f32(x.astype(cdt), da1, (((0,), (0,)), ((), ())))
    db1a = jnp.sum(da1_32, axis=0, keepdims=True)
    dx_ref[0] = _dot_f32(
        da1, w1a_ref[...].astype(cdt), (((1,), (1,)), ((), ()))
    ).astype(dx_ref.dtype)

    # ---- parameter-grad accumulation across the sequential grid
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    updates = (
        (dw1a_ref, dw1a), (db1a_ref, db1a), (ds1_ref, ds1), (dt1_ref, dt1),
        (dw1b_ref, dw1b), (db1b_ref, db1b),
        (dw2a_ref, dw2a), (db2a_ref, db2a), (ds2_ref, ds2), (dt2_ref, dt2),
        (dw2b_ref, dw2b), (db2b_ref, db2b),
    )

    @pl.when(first)
    def _init():
        for ref, _ in updates:
            ref[...] = jnp.zeros_like(ref)

    for ref, val in updates:
        ref[...] += val.astype(ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "group_size", "cdt", "rows_target",
                     "act", "interpret"),
)
def patch_encoder_fused_bwd(
    grouped: jnp.ndarray,
    params: tuple,
    dout: jnp.ndarray,
    *,
    num_groups: int,
    group_size: int,
    cdt=jnp.bfloat16,
    rows_target: int | None = None,
    act: str = "erf",
    interpret: bool = False,
):
    """Fused backward: (dgrouped, dparams-12-tuple).

    Parameter grads are fp32 (accumulated across tiles); dgrouped has
    grouped's dtype. Vector grads come back with the params' 1-D shapes.
    """
    B = grouped.shape[0]
    G, K = num_groups, group_size
    if rows_target is None:
        rows_target = 2048 if jnp.dtype(cdt).itemsize <= 2 else 1024
    tg = _pick_tile(G, K, rows_target)
    rows = tg * K
    c_out = params[10].shape[1]

    vecs = tuple(p.reshape(1, -1) if p.ndim == 1 else p for p in params)
    full_in = lambda p: pl.BlockSpec(p.shape, lambda b, g: (0, 0))
    full_out = lambda p: pl.BlockSpec(p.shape, lambda b, g: (0, 0))
    from jax.experimental.pallas import tpu as pltpu

    out_shapes = [
        jax.ShapeDtypeStruct(grouped.shape, grouped.dtype),
        *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in vecs],
    ]
    out_specs = [
        pl.BlockSpec((1, rows, grouped.shape[-1]), lambda b, g: (b, g, 0)),
        *[full_out(p) for p in vecs],
    ]
    dx, *dvecs = pl.pallas_call(
        functools.partial(_bwd_kernel, tg=tg, k=K, cdt=cdt, act=act),
        grid=(B, G // tg),
        in_specs=[
            pl.BlockSpec((1, rows, grouped.shape[-1]), lambda b, g: (b, g, 0)),
            *[full_in(p) for p in vecs],
            pl.BlockSpec((1, tg, c_out), lambda b, g: (b, g, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the bwd working set (~33 MB at 2048 rows) exceeds the 16 MB
            # default scoped-vmem budget; v5e has 128 MB physical VMEM.
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=interpret,
    )(grouped, *vecs, dout)
    dparams = tuple(
        dv.reshape(p.shape) for dv, p in zip(dvecs, params)
    )
    return dx, dparams
