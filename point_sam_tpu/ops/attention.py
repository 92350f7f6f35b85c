"""Pallas TPU multi-head attention kernel for the point-patch ViT.

The encoder attends over G <= 2048 patch tokens (reference backbone usage,
SURVEY.md §3.1 "HOTTEST"). The XLA einsum path materializes the
[B, H, G, G] fp32 logit tensor in HBM every layer (24 x ~270 MB round
trips for ViT-L at G=2048) — that HBM traffic, not FLOPs, dominates. This
kernel keeps everything on-chip: for each (batch, head, query-block), the
full K/V for that head live in VMEM, the [bq, G] logit block exists only in
VMEM/registers, softmax runs in fp32, and only the [bq, dh] output is
written back.

Token counts this small don't need online (streaming) softmax: the whole
key axis fits in VMEM, so this is a single-pass kernel — simpler and
faster than a streaming flash implementation at G <= 4k.

Exposed as ``mha(q, k, v)`` with an einsum fallback for CPU/debug.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scale_folds_exactly(scale: float) -> bool:
    """True iff multiplying by ``scale`` is exact in any binary float
    format (a power of two — only the exponent changes). Then
    dot(q*scale, k) is BIT-identical to dot(q, k)*scale and the fold
    replaces a [rows, S] fp32 VPU pass with a [rows, dh] one (S/dh = 32x
    fewer elements at the ViT-L config). dh=64 -> scale=1/8: exact."""
    import math

    m, _ = math.frexp(scale)
    return m == 0.5


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # block shapes: q [1, 1, bq, dh]; k, v [1, 1, S, dh]; o [1, 1, bq, dh]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    fold = _scale_folds_exactly(scale)
    if fold:  # pre-scale q: [bq, dh] multiply instead of [bq, S]
        q = q * jnp.asarray(scale, q.dtype)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S]
    if not fold:
        logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # Normalize AFTER the PV matmul: o = (e @ v) / denom. Kills the
    # [bq, S] divide (a full VPU pass over the attention matrix) in favor
    # of a [bq, dh] one — measured -0.7 ms across the 24 ViT-L layers
    # (kbench8 r5 v_attn_postdiv). Numerics: e rounds to bf16 where p did
    # (same relative rounding, denom is a per-row constant) and the final
    # divide now happens in fp32 — at worst equal, typically closer to the
    # fp32 reference.
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def mha_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head attention, softmax over the full key axis.

    Args:
        q, k, v: [B, H, S, dh] (same S for q and k/v; no masking — encoder
            self-attention over patch tokens is dense).

    Returns: [B, H, S, dh] with q's dtype.
    """
    B, H, S, dh = q.shape
    scale = 1.0 / float(dh) ** 0.5
    bq = min(block_q, S)
    while S % bq and bq > 1:
        bq //= 2
    if S % bq:
        raise ValueError(f"S={S} must be divisible by some block_q <= {block_q}")

    grid = (B, H, S // bq)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, dh), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


@jax.custom_vjp
def mha_pallas_ad(q, k, v):
    """mha_pallas with a custom VJP (Pallas kernels aren't reverse-mode
    differentiable under remat's partial evaluation). Backward recomputes
    the softmax with plain XLA einsums — under the ViT's per-block remat
    only one layer's [S, S] intermediates are live at a time."""
    return mha_pallas(q, k, v)


def _mha_fwd(q, k, v):
    return mha_pallas(q, k, v), (q, k, v)


def _mha_bwd(res, do):
    q, k, v = res
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    do32 = do.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


mha_pallas_ad.defvjp(_mha_fwd, _mha_bwd)


def mha_reference(q, k, v):
    """Einsum attention (the fallback; numerics-matching fp32 softmax)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(dh))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def mha(q, k, v, *, use_pallas: bool | None = None):
    """[B, H, S, dh] attention with automatic kernel dispatch."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        S, dh = q.shape[2], q.shape[3]
        # Mosaic needs lane/sublane-friendly shapes; small configs (tests,
        # tiny presets) take the einsum path, where XLA is fine anyway.
        if S >= 128 and S % 128 == 0 and dh >= 64:
            return mha_pallas_ad(q, k, v)
    return mha_reference(q, k, v)


# ================================================== packed-heads variant
#
# The [B, H, S, dh] layout above forces XLA to materialize four transposed
# copies of the activations per layer (q/k/v head-split before the kernel,
# head-merge after) — pure HBM traffic on the ViT hot path. This variant
# reads the projection outputs [B, S, D] DIRECTLY: each grid cell owns a
# 128-lane slice = two dh=64 heads (the EVA02-L/base head size), slices the
# per-head halves with static lane offsets in VMEM, and writes the output
# back in [B, S, D] layout for the out-projection. No relayouts anywhere.


def _mha_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, dh: int,
                       heads_per_block: int):
    q = q_ref[0]  # [bq, hpb*dh]
    k = k_ref[0]  # [S, hpb*dh]
    v = v_ref[0]
    fold = _scale_folds_exactly(scale)
    outs = []
    for j in range(heads_per_block):
        sl = slice(j * dh, (j + 1) * dh)
        qj, kj, vj = q[:, sl], k[:, sl], v[:, sl]
        if fold:  # exact (power-of-two scale); see _scale_folds_exactly
            qj = qj * jnp.asarray(scale, qj.dtype)
        logits = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, S]
        if not fold:
            logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        # Post-PV normalization (see _mha_kernel): one [bq, dh] divide
        # instead of a [bq, S] one; -0.7 ms over ViT-L (kbench8 r5).
        o = jax.lax.dot_general(
            e.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "interpret")
)
def mha_packed_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention on [B, S, D] inputs without head-split transposes.

    Requires D // num_heads in {64, 128} (lane-slice-friendly) and, for
    dh=64, an even head count. Numerics identical to mha_pallas.
    """
    B, S, D = q.shape
    dh = D // num_heads
    scale = 1.0 / float(dh) ** 0.5
    hpb = 128 // dh  # heads per 128-lane block
    bq = min(block_q, S)
    while S % bq and bq > 1:
        bq //= 2

    grid = (B, num_heads // hpb, S // bq)
    lanes = hpb * dh
    return pl.pallas_call(
        functools.partial(_mha_packed_kernel, scale=scale, dh=dh,
                          heads_per_block=hpb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, S, lanes), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, lanes), lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_packed_ad(q, k, v, num_heads):
    """mha_packed_pallas with a custom VJP (same rationale as
    mha_pallas_ad; the backward reshapes to per-head layout and reuses the
    einsum math — transposes in the backward are off the serving hot path
    and fuse into the surrounding grad matmuls)."""
    return mha_packed_pallas(q, k, v, num_heads)


def _mha_packed_fwd(q, k, v, num_heads):
    return mha_packed_pallas(q, k, v, num_heads), (q, k, v)


def _split_heads(t, h):
    B, S, D = t.shape
    return t.reshape(B, S, h, D // h).transpose(0, 2, 1, 3)


def _mha_packed_bwd(num_heads, res, do):
    q, k, v = res
    B, S, D = q.shape
    dh = D // num_heads
    if (
        jax.default_backend() == "tpu"
        and dh in (64, 128)
        and num_heads % (128 // dh) == 0
        and 128 <= S <= 2048
        and S % 128 == 0
    ):
        # Fused Pallas backward: per-head [S, S] stays in VMEM (the XLA
        # fallback below materializes two [B, H, S, S] fp32 tensors in
        # HBM per layer — the dominant train-step encode-bwd cost,
        # round-3 tbench).
        return mha_packed_bwd_pallas(q, k, v, do, num_heads)
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    doh = _split_heads(do, num_heads)
    dq, dk, dv = _mha_bwd((qh, kh, vh), doh)
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(B, S, D)  # noqa: E731
    return merge(dq), merge(dk), merge(dv)


mha_packed_ad.defvjp(_mha_packed_fwd, _mha_packed_bwd)


def mha_flat(q, k, v, num_heads, *, use_pallas: bool | None = None):
    """[B, S, D] attention: packed-heads Pallas kernel when the layout
    allows (dh in {64, 128}, lane-aligned S), else head-split + mha."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    B, S, D = q.shape
    dh = D // num_heads
    if (
        use_pallas
        and dh in (64, 128)
        and num_heads % (128 // dh) == 0
        and S >= 128
        and S % 128 == 0
    ):
        return mha_packed_ad(q, k, v, num_heads)
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    out = mha(qh, kh, vh, use_pallas=use_pallas)
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)


# ================================================== fused packed backward
#
# The einsum backward above recomputes softmax with XLA, which materializes
# TWO [B, H, S, S] fp32 tensors (p and dp) in HBM per layer — at the train
# config ([2, 16, 1024, 1024]) that is ~0.5 GB of round trips per ViT
# layer and measured ~tens of ms of the 312 ms train step (round-3
# tbench). This kernel keeps the whole per-head [S, S] attention matrix in
# VMEM: one grid cell owns a (batch, 128-lane head pair), recomputes the
# softmax, and emits dq/dk/dv for its lane slice directly in [B, S, D]
# layout — no accumulation across cells, no HBM logits, no transposes.


def _mha_packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                           dv_ref, *, scale: float, dh: int,
                           heads_per_block: int):
    q = q_ref[0]  # [S, hpb*dh]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    fold = _scale_folds_exactly(scale)
    dqs, dks, dvs = [], [], []
    for j in range(heads_per_block):
        sl = slice(j * dh, (j + 1) * dh)
        qj, kj, vj, doj = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        # Power-of-two scale: fold onto the [S, dh] operands instead of
        # paying two [S, S] fp32 VPU passes (logits*scale and ds*scale).
        # Bit-exact (see _scale_folds_exactly): logits via pre-scaled q,
        # dk = ds_u^T @ (q*scale), dq = ds_u @ (k*scale).
        qs = qj * jnp.asarray(scale, qj.dtype) if fold else qj
        logits = jax.lax.dot_general(
            qs, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S]
        if not fold:
            logits = logits * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 [S, S]

        do32 = doj.astype(jnp.float32)
        v32 = vj.astype(jnp.float32)
        # dv = p^T do  (contract over queries)
        dvs.append(jax.lax.dot_general(
            p, do32, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        # dp = do v^T
        dp = jax.lax.dot_general(
            do32, v32, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if not fold:
            ds = ds * scale
        kq = (kj * jnp.asarray(scale, kj.dtype)) if fold else kj
        qq = qs if fold else qj
        dqs.append(jax.lax.dot_general(
            ds, kq.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds, qq.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def mha_packed_bwd_pallas(q, k, v, do, num_heads, *, interpret=False):
    """dq, dk, dv for mha_packed_pallas — [B, S, D] in/out, per-head [S, S]
    matrices VMEM-resident. Requires S small enough for [S, S] fp32 in
    VMEM (S <= 2048: p + dp = 32 MB/head; gated by the caller)."""
    B, S, D = q.shape
    dh = D // num_heads
    scale = 1.0 / float(dh) ** 0.5
    hpb = 128 // dh
    lanes = hpb * dh
    from jax.experimental.pallas import tpu as pltpu

    grid = (B, num_heads // hpb)
    spec = pl.BlockSpec((1, S, lanes), lambda b, h: (b, 0, h))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_packed_bwd_kernel, scale=scale, dh=dh,
                          heads_per_block=hpb),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv
