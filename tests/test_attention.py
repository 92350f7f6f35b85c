"""Pallas attention kernel: forward + custom-VJP gradients vs einsum."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import point_sam_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    # CPU test runner: run the kernel in interpreter mode.
    monkeypatch.setattr(A, "mha_pallas", partial(A.mha_pallas, interpret=True))
    yield


def make_qkv(rng, B=1, H=2, S=64, D=16):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
        for _ in range(3)
    )


def test_forward_matches_reference(rng):
    q, k, v = make_qkv(rng)
    out = A.mha_pallas(q, k, v, block_q=32)
    ref = A.mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_custom_vjp_matches_reference_grads(rng):
    q, k, v = make_qkv(rng, S=32)

    def loss_p(q, k, v):
        return jnp.sum(jnp.sin(A.mha_pallas_ad(q, k, v)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(A.mha_reference(q, k, v)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_under_remat(rng):
    """The ViT wraps blocks in jax.checkpoint; the kernel must differentiate
    under remat's partial evaluation (the original failure mode)."""
    q, k, v = make_qkv(rng, S=32)

    @jax.checkpoint
    def block(q, k, v):
        return A.mha_pallas_ad(q, k, v)

    g = jax.grad(lambda q: jnp.sum(block(q, k, v) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------- packed-heads kernel
def make_flat_qkv(rng, B=2, S=256, H=4, dh=64):
    D = H * dh
    return tuple(
        jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
        for _ in range(3)
    ), H


def _flat_reference(q, k, v, h):
    B, S, D = q.shape
    sh = lambda t: t.reshape(B, S, h, D // h).transpose(0, 2, 1, 3)
    out = A.mha_reference(sh(q), sh(k), sh(v))
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)


def test_packed_forward_matches_reference(rng, monkeypatch):
    monkeypatch.setattr(
        A, "mha_packed_pallas", partial(A.mha_packed_pallas, interpret=True)
    )
    (q, k, v), h = make_flat_qkv(rng)
    out = A.mha_packed_pallas(q, k, v, h, block_q=128)
    ref = _flat_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_dh128_single_head_blocks(rng, monkeypatch):
    monkeypatch.setattr(
        A, "mha_packed_pallas", partial(A.mha_packed_pallas, interpret=True)
    )
    (q, k, v), _ = make_flat_qkv(rng, H=2, dh=128)
    out = A.mha_packed_pallas(q, k, v, 2, block_q=128)
    ref = _flat_reference(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_vjp_matches_reference_grads(rng):
    (q, k, v), h = make_flat_qkv(rng, S=128)
    do = jnp.asarray(
        np.random.default_rng(1).standard_normal(q.shape).astype(np.float32)
    )
    _, vjp_ref = jax.vjp(lambda a, b, c: _flat_reference(a, b, c, h), q, k, v)
    gr = vjp_ref(do)
    gp = A._mha_packed_bwd(h, (q, k, v), do)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mha_flat_fallback_odd_heads(rng):
    """dh=32 (tiny preset) must route to the einsum path and still match."""
    (q, k, v), _ = make_flat_qkv(rng, H=4, dh=32)
    out = A.mha_flat(q, k, v, 4, use_pallas=False)
    ref = _flat_reference(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_bwd_kernel_matches_einsum_bwd(rng):
    """Fused Pallas attention backward (interpret) vs the einsum backward
    — must be numerically identical (same fp32 softmax + grad formulas)."""
    (q, k, v), h = make_flat_qkv(rng, S=256)
    do = jnp.asarray(
        np.random.default_rng(3).standard_normal(q.shape).astype(np.float32))
    gk = A.mha_packed_bwd_pallas(q, k, v, do, h, interpret=True)
    qh, kh, vh = (A._split_heads(t, h) for t in (q, k, v))
    ge = A._mha_bwd((qh, kh, vh), A._split_heads(do, h))
    B, S, D = q.shape
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(B, S, D)  # noqa: E731
    for a, b in zip(gk, (merge(x) for x in ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
