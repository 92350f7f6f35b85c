"""Shape/finite tests for the experimental propagate variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_sam_tpu.models.decoder_variants import (
    PatchDropout,
    Propagate,
    PropagateAttn,
    PropagateNN,
)


@pytest.fixture()
def inputs(rng):
    B, N, L, D = 2, 100, 8, 32
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.random((B, N, 3)).astype(np.float32))
    centers = xyz[:, :L]
    feats = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    return xyz, rgb, centers, feats


@pytest.mark.parametrize("cls", [Propagate, PropagateAttn, PropagateNN])
def test_propagate_variants(cls, inputs):
    xyz, rgb, centers, feats = inputs
    mod = cls(feats_dim=feats.shape[-1])
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, rgb, centers, feats)
    out = mod.apply(vars_, xyz, rgb, centers, feats)
    assert out.shape == (xyz.shape[0], xyz.shape[1], feats.shape[-1])
    assert np.isfinite(np.asarray(out)).all()


def test_patch_dropout(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    pd = PatchDropout(prob=0.5)
    vars_ = pd.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x)
    # deterministic: identity
    out, keep = pd.apply(vars_, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # training: keeps ceil(L * (1-p)) tokens, all drawn from the input
    out, keep = pd.apply(vars_, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == (2, 10, 8)
    for b in range(2):
        for t in range(10):
            assert (np.abs(np.asarray(x[b]) -
                           np.asarray(out[b, t])).max(1) < 1e-6).any()
