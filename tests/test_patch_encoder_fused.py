"""Fused Pallas patch-encoder kernel vs the XLA module path.

Runs the kernel in interpret mode (CPU backend, conftest) so the grid/
blockspec plumbing and the in-kernel math are exercised without TPU
hardware; numerics are compared against both patch_encoder_reference and
the PatchEncoder module's XLA branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_sam_tpu.models.patch_encoder import PatchEncoder
from point_sam_tpu.ops.patch_encoder_pallas import (
    _pick_tile,
    erf_f32,
    fused_dispatch_ok,
    patch_encoder_fused,
    patch_encoder_reference,
)


def _params_of(variables):
    p1 = variables["params"]["conv1"]
    p2 = variables["params"]["conv2"]
    return tuple(
        jnp.asarray(p)
        for p in (
            p1["Dense_0"]["kernel"], p1["Dense_0"]["bias"],
            p1["LayerNorm_0"]["LayerNorm_0"]["scale"],
            p1["LayerNorm_0"]["LayerNorm_0"]["bias"],
            p1["Dense_1"]["kernel"], p1["Dense_1"]["bias"],
            p2["Dense_0"]["kernel"], p2["Dense_0"]["bias"],
            p2["LayerNorm_0"]["LayerNorm_0"]["scale"],
            p2["LayerNorm_0"]["LayerNorm_0"]["bias"],
            p2["Dense_1"]["kernel"], p2["Dense_1"]["bias"],
        )
    )


class TestFusedPatchEncoder:
    @pytest.mark.parametrize(
        "B,G,K,cin,out,hidden",
        [
            (2, 16, 32, 6, 64, (32, 64)),   # flagship shape, scaled down
            (1, 8, 64, 9, 32, (16, 32)),    # centralize_features channels
            (1, 16, 8, 131, 64, (32, 64)),  # hier level-2-like channels
        ],
    )
    def test_matches_module(self, B, G, K, cin, out, hidden):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=out, hidden_dims=hidden,
                          dtype=jnp.float32)
        variables = pe.init(jax.random.PRNGKey(1), x)
        want = pe.apply(variables, x)  # CPU backend -> XLA module branch
        params = _params_of(variables)
        got = patch_encoder_fused(
            x.reshape(B, G * K, cin), params, num_groups=G, group_size=K,
            cdt=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_reference_matches_module(self):
        rng = np.random.default_rng(2)
        B, G, K, cin = 1, 8, 16, 6
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=32, hidden_dims=(16, 32),
                          dtype=jnp.float32)
        variables = pe.init(jax.random.PRNGKey(1), x)
        want = pe.apply(variables, x)
        got = patch_encoder_reference(
            x.reshape(B, G * K, cin), _params_of(variables),
            num_groups=G, group_size=K, cdt=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_erf_polynomial(self):
        xs = jnp.linspace(-6, 6, 20001, dtype=jnp.float32)
        err = jnp.max(jnp.abs(erf_f32(xs) - jax.lax.erf(xs)))
        assert float(err) < 1e-6

    def test_grad_matches_reference(self):
        rng = np.random.default_rng(3)
        B, G, K, cin = 1, 8, 16, 6
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=32, hidden_dims=(16, 32),
                          dtype=jnp.float32)
        variables = pe.init(jax.random.PRNGKey(1), x)
        params = _params_of(variables)
        flat = x.reshape(B, G * K, cin)

        # The custom-VJP backward IS the reference vjp; check it against
        # autodiff of the module for the input gradient.
        from point_sam_tpu.ops.patch_encoder_pallas import _bwd

        g = jnp.ones((B, G, 32), jnp.float32)
        (dx, dparams) = _bwd(G, K, jnp.float32, "erf", (flat, params), g)
        want_dx = jax.grad(
            lambda xx: jnp.sum(pe.apply(variables, xx))
        )(x).reshape(flat.shape)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("rows_target", [256, 1024])
    def test_fused_bwd_matches_reference_vjp(self, rows_target):
        # rows_target=256 forces multiple grid tiles -> exercises the
        # cross-tile parameter-gradient accumulation.
        from point_sam_tpu.ops.patch_encoder_pallas import (
            patch_encoder_fused_bwd,
        )

        rng = np.random.default_rng(5)
        B, G, K, cin, out = 2, 16, 32, 6, 64
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=out, hidden_dims=(32, 64),
                          dtype=jnp.float32)
        variables = pe.init(jax.random.PRNGKey(1), x)
        params = _params_of(variables)
        flat = x.reshape(B, G * K, cin)
        dout = jnp.asarray(rng.standard_normal((B, G, out)).astype(np.float32))

        _, vjp = jax.vjp(
            lambda xx, pp: patch_encoder_reference(
                xx, pp, num_groups=G, group_size=K, cdt=jnp.float32
            ),
            flat, params,
        )
        want_dx, want_dp = vjp(dout)
        got_dx, got_dp = patch_encoder_fused_bwd(
            flat, params, dout, num_groups=G, group_size=K,
            cdt=jnp.float32, rows_target=rows_target, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=1e-4, atol=1e-5)
        for got, want in zip(got_dp, want_dp):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_tanh_act_matches_module(self):
        """act='tanh' (PointSAMConfig.patch_act): fused kernel ==
        PointNetLayer XLA branch with nn.gelu(approximate=True)."""
        rng = np.random.default_rng(7)
        B, G, K, cin, out = 2, 16, 32, 6, 64
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=out, hidden_dims=(32, 64),
                          dtype=jnp.float32, act="tanh")
        variables = pe.init(jax.random.PRNGKey(1), x)
        want = pe.apply(variables, x)
        params = _params_of(variables)
        got = patch_encoder_fused(
            x.reshape(B, G * K, cin), params, num_groups=G, group_size=K,
            cdt=jnp.float32, act="tanh", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # tanh vs erf output deviation is bounded (~3e-4 per activation
        # into a Lipschitz tail) — sanity-check it is small but nonzero.
        pe_erf = PatchEncoder(out_channels=out, hidden_dims=(32, 64),
                              dtype=jnp.float32, act="erf")
        want_erf = pe_erf.apply(variables, x)
        diff = float(jnp.max(jnp.abs(want - want_erf)))
        assert 0 < diff < 5e-2

    def test_tanh_fused_bwd_matches_reference_vjp(self):
        from point_sam_tpu.ops.patch_encoder_pallas import (
            patch_encoder_fused_bwd,
        )

        rng = np.random.default_rng(11)
        B, G, K, cin, out = 1, 16, 32, 6, 64
        x = jnp.asarray(rng.standard_normal((B, G, K, cin)).astype(np.float32))
        pe = PatchEncoder(out_channels=out, hidden_dims=(32, 64),
                          dtype=jnp.float32, act="tanh")
        variables = pe.init(jax.random.PRNGKey(1), x)
        params = _params_of(variables)
        flat = x.reshape(B, G * K, cin)
        dout = jnp.asarray(rng.standard_normal((B, G, out)).astype(np.float32))
        _, vjp = jax.vjp(
            lambda xx, pp: patch_encoder_reference(
                xx, pp, num_groups=G, group_size=K, cdt=jnp.float32,
                act="tanh",
            ),
            flat, params,
        )
        want_dx, want_dp = vjp(dout)
        got_dx, got_dp = patch_encoder_fused_bwd(
            flat, params, dout, num_groups=G, group_size=K,
            cdt=jnp.float32, rows_target=256, act="tanh", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=1e-4, atol=1e-5)
        for got, want in zip(got_dp, want_dp):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-4)

    def test_dispatch_gate(self):
        # CPU backend: never dispatches.
        assert not fused_dispatch_ok(2048, 256, 6)
        # Tile picking obeys the divisor rule.
        assert _pick_tile(2048, 256) == 16
        assert _pick_tile(64, 32) == 64
        assert 100 % _pick_tile(100, 256) == 0
