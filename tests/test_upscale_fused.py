"""Fused Pallas decode-upscale kernel vs the XLA module path.

Covers (interpret mode on the CPU backend, conftest):
- kernel numerics vs upscale_hyper_reference and vs the MaskDecoder
  module's XLA branch (OutputUpscaling.finish + hypernet einsum),
- the Dense_0 hoist: project-then-interp equals interp-then-project
  (the 3-NN weights sum to 1),
- the custom-VJP backward (XLA recompute) vs jax.vjp of the reference,
- the dispatch gate shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_sam_tpu.ops.upscale_pallas import (
    _pick_tile_n,
    upscale_dispatch_ok,
    upscale_hyper_fused,
    upscale_hyper_reference,
)


def _make(bm=2, n=192, d=128, c=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bm, n, d)).astype(np.float32))
    params = tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.standard_normal(d) * 0.2 + 1.0,
            rng.standard_normal(d) * 0.1,
            rng.standard_normal((d, d)) / np.sqrt(d),
            rng.standard_normal(d) * 0.1,
        )
    )
    hyper = jnp.asarray(rng.standard_normal((bm, c, d)).astype(np.float32))
    return x, params, hyper


class TestUpscaleFused:
    @pytest.mark.parametrize("bm,n,c", [(2, 192, 3), (1, 64, 1), (3, 104, 4)])
    def test_matches_reference(self, bm, n, c):
        x, params, hyper = _make(bm=bm, n=n, c=c)
        want = upscale_hyper_reference(x, params, hyper, cdt=jnp.float32)
        got = upscale_hyper_fused(
            x, params, hyper, cdt=jnp.float32, rows_target=64, interpret=True
        )
        assert got.shape == (bm, c, n)
        # erf_f32 polynomial vs lax.erf: ~5e-7 per element, summed over the
        # D=128 hypernet contraction.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_reference_matches_module(self):
        """upscale_hyper_reference == OutputUpscaling.finish + einsum."""
        from point_sam_tpu.models.mask_decoder import OutputUpscaling

        x, params, hyper = _make()
        mod = OutputUpscaling(dim=x.shape[-1], dtype=jnp.float32)
        s, t, w, b = params
        variables = {"params": {
            "Dense_0": {"kernel": jnp.eye(x.shape[-1]),
                        "bias": jnp.zeros(x.shape[-1])},
            "LayerNorm_0": {"LayerNorm_0": {"scale": s, "bias": t}},
            "Dense_1": {"kernel": w, "bias": b},
        }}
        up = mod.apply(variables, x, method=mod.finish)
        want = jnp.einsum("bcd,bnd->bcn", hyper, up,
                          preferred_element_type=jnp.float32)
        got = upscale_hyper_reference(x, params, hyper, cdt=jnp.float32)
        # flax nn.LayerNorm folds the scale into rsqrt before the multiply;
        # the reference associates (x-m)*rsqrt*s — few-ulp fp32 difference.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

    def test_project_hoist_exact(self):
        """interp(Dense(x)) vs Dense(interp(x)): equal because the 3-NN
        weights sum to 1 (fp32, tolerance for reassociation only)."""
        from point_sam_tpu.ops import (
            compute_interp_weights,
            interpolate_features,
        )

        rng = np.random.default_rng(3)
        b, g, n, d = 2, 32, 100, 16
        centers = jnp.asarray(rng.standard_normal((b, g, 3)).astype(np.float32))
        pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
        feats = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(d).astype(np.float32))
        idx, wts = compute_interp_weights(pts, centers)
        a = interpolate_features(feats @ w + bias, idx, wts)
        bb = interpolate_features(feats, idx, wts) @ w + bias
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)

    def test_custom_vjp_backward(self):
        """upscale_hyper_ad grads == jax.vjp of the reference (the backward
        IS the reference recompute; forward interpret-mode on CPU is not
        available through the ad wrapper, so compare reference-vs-reference
        gradient plumbing through the custom_vjp machinery)."""
        from point_sam_tpu.ops.upscale_pallas import _bwd

        x, params, hyper = _make(bm=1, n=64, d=128)
        g = jnp.ones((1, hyper.shape[1], x.shape[1]), jnp.float32)
        dx, dp, dh = _bwd(jnp.float32, (x, params, hyper), g)
        _, vjp = jax.vjp(
            lambda x_, p_, h_: upscale_hyper_reference(
                x_, p_, h_, cdt=jnp.float32),
            x, params, hyper,
        )
        wx, wp, wh = vjp(g)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(wx), atol=1e-6)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(wh), atol=1e-6)
        for got_p, want_p in zip(dp, wp):
            np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                       atol=1e-6)

    @pytest.mark.parametrize("b,m,n,c", [(2, 2, 100, 3), (1, 1, 512, 1)])
    def test_interp_fused_matches_reference(self, b, m, n, c):
        """Interp-in-kernel variant (weighted one-hot matmul) vs the XLA
        gather + tail reference, including the N padding path."""
        from point_sam_tpu.ops.upscale_pallas import (
            interp_upscale_hyper_fused,
            interp_upscale_reference,
        )

        rng = np.random.default_rng(7)
        g, d = 32, 128
        h1 = jnp.asarray(
            rng.standard_normal((b * m, g, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, g, (b, n, 3)).astype(np.int32))
        w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)).astype(np.float32))
        _, params, _ = _make(d=d)
        hyper = jnp.asarray(
            rng.standard_normal((b * m, c, d)).astype(np.float32))
        want = interp_upscale_reference(h1, idx, w, params, hyper,
                                        cdt=jnp.float32)
        got = interp_upscale_hyper_fused(h1, idx, w, params, hyper,
                                         cdt=jnp.float32, interpret=True)
        assert got.shape == (b * m, c, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_interp_fused_duplicate_indices(self):
        """Degenerate 3-NN triples (duplicate center indices) must ADD in
        the one-hot matrix, matching gather-sum semantics."""
        from point_sam_tpu.ops.upscale_pallas import (
            interp_upscale_hyper_fused,
            interp_upscale_reference,
        )

        rng = np.random.default_rng(8)
        b, m, g, n, d, c = 1, 1, 16, 16, 128, 2
        h1 = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
        idx = jnp.asarray(
            np.stack([np.full((n,), 5), np.full((n,), 5),
                      rng.integers(0, g, n)], -1)[None].astype(np.int32))
        w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)).astype(np.float32))
        _, params, _ = _make(d=d)
        hyper = jnp.asarray(rng.standard_normal((b, c, d)).astype(np.float32))
        want = interp_upscale_reference(h1, idx, w, params, hyper,
                                        cdt=jnp.float32)
        got = interp_upscale_hyper_fused(h1, idx, w, params, hyper,
                                         cdt=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)

    def test_interp_fused_backward(self):
        """_bwd2 (XLA recompute) == jax.vjp of the interp+tail reference."""
        from point_sam_tpu.ops.upscale_pallas import (
            _bwd2,
            interp_upscale_reference,
        )

        rng = np.random.default_rng(9)
        b, m, g, n, d, c = 1, 2, 16, 24, 128, 3
        h1 = jnp.asarray(
            rng.standard_normal((b * m, g, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, g, (b, n, 3)).astype(np.int32))
        w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)).astype(np.float32))
        _, params, _ = _make(d=d)
        hyper = jnp.asarray(
            rng.standard_normal((b * m, c, d)).astype(np.float32))
        gg = jnp.ones((b * m, c, n), jnp.float32)
        dh1, didx, dw, dp, dh = _bwd2(
            jnp.float32, (h1, idx, w, params, hyper), gg)
        _, vjp = jax.vjp(
            lambda h_, p_, hy_: interp_upscale_reference(
                h_, idx, w, p_, hy_, cdt=jnp.float32),
            h1, params, hyper,
        )
        wh1, wp, why = vjp(gg)
        # _bwd2 may recompute via the matmul form (interp as a dense
        # [N, G] matrix), which reorders the fp32 gather-sum — tolerate
        # last-ulp summation-order noise.
        np.testing.assert_allclose(np.asarray(dh1), np.asarray(wh1),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(why),
                                   atol=1e-5, rtol=1e-5)
        assert didx.dtype == jax.dtypes.float0
        assert not np.asarray(dw).any()

    def test_ad_wrapper_end_to_end_interpret(self):
        """jax.grad THROUGH the custom_vjp wrappers with the real Pallas
        forward in interpret mode (ADVICE r4: the plumbing-only backward
        test could never catch a defvjp wiring bug — e.g. a swapped
        argument order — because the fused forward was never run through
        the _ad wrappers on CPU). Checks both the forward value and every
        cotangent against jax.grad of the reference."""
        import point_sam_tpu.ops.upscale_pallas as up

        rng = np.random.default_rng(11)
        b, m, g, n, d, c = 1, 2, 16, 24, 128, 3
        h1 = jnp.asarray(rng.standard_normal((b * m, g, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, g, (b, n, 3)).astype(np.int32))
        w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)).astype(np.float32))
        _, params, _ = _make(d=d)
        hyper = jnp.asarray(
            rng.standard_normal((b * m, c, d)).astype(np.float32))

        orig_interp, orig_plain = (up.interp_upscale_hyper_fused,
                                   up.upscale_hyper_fused)
        try:
            up.interp_upscale_hyper_fused = functools.partial(
                orig_interp, interpret=True)
            up.upscale_hyper_fused = functools.partial(
                orig_plain, interpret=True)

            def loss_fused(h_, p_, hy_):
                out = up.interp_upscale_hyper_ad(h_, idx, w, p_, hy_,
                                                 jnp.float32)
                return jnp.sum(out * out), out

            def loss_ref(h_, p_, hy_):
                out = up.interp_upscale_reference(h_, idx, w, p_, hy_,
                                                  cdt=jnp.float32)
                return jnp.sum(out * out), out

            (lv, out), grads = jax.value_and_grad(
                loss_fused, argnums=(0, 1, 2), has_aux=True)(h1, params, hyper)
            (lw, want_out), wgrads = jax.value_and_grad(
                loss_ref, argnums=(0, 1, 2), has_aux=True)(h1, params, hyper)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                       atol=2e-4, rtol=2e-4)
            for got_t, want_t in zip(jax.tree_util.tree_leaves(grads),
                                     jax.tree_util.tree_leaves(wgrads)):
                np.testing.assert_allclose(np.asarray(got_t),
                                           np.asarray(want_t),
                                           atol=5e-3, rtol=5e-3)

            # The plain (gather-outside) wrapper too: upscale_hyper_ad.
            x = jnp.asarray(
                rng.standard_normal((b * m, 64, d)).astype(np.float32))
            hy2 = jnp.asarray(
                rng.standard_normal((b * m, c, d)).astype(np.float32))
            gf = jax.grad(lambda x_: jnp.sum(
                up.upscale_hyper_ad(x_, params, hy2, jnp.float32) ** 2))(x)
            gr = jax.grad(lambda x_: jnp.sum(
                up.upscale_hyper_reference(x_, params, hy2,
                                           cdt=jnp.float32) ** 2))(x)
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=5e-3, rtol=5e-3)
        finally:
            up.interp_upscale_hyper_fused = orig_interp
            up.upscale_hyper_fused = orig_plain

    def test_tile_and_gate(self):
        assert _pick_tile_n(100_000) == 4000
        assert _pick_tile_n(4096) == 4096
        assert _pick_tile_n(104, 4096) == 104  # 104 % 8 == 0
        assert _pick_tile_n(100) == 0  # no %8 divisor
        assert _pick_tile_n(7) == 0
        # CPU backend: gates must refuse (fused paths unreachable in tests).
        from point_sam_tpu.ops.upscale_pallas import interp_upscale_dispatch_ok

        assert not upscale_dispatch_ok(100_000, 256, 3)
        assert not interp_upscale_dispatch_ok(100_000, 2048, 256, 3)


class TestDecoderUsesHoist:
    def test_decoder_end_to_end(self):
        """MaskDecoder forward (XLA branch, CPU) still produces finite,
        shape-correct masks after the Dense_0 hoist, and the param tree
        keeps the original names."""
        from point_sam_tpu.models.mask_decoder import MaskDecoder

        rng = np.random.default_rng(0)
        b, m, g, n, d, p = 1, 2, 16, 40, 64, 2
        dec = MaskDecoder(transformer_dim=d, num_heads=4, mlp_dim=128,
                          dtype=jnp.float32)
        emb = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
        pe = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
        sparse = jnp.asarray(
            rng.standard_normal((b * m, p, d)).astype(np.float32))
        dense = jnp.asarray(
            rng.standard_normal((b * m, g, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, g, (b, n, 3)).astype(np.int32))
        w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)).astype(np.float32))
        variables = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense,
                             interp_index=idx, interp_weight=w)
        up = variables["params"]["output_upscaling"]
        assert set(up) == {"Dense_0", "LayerNorm_0", "Dense_1"}
        masks, ious = dec.apply(variables, emb, pe, sparse, dense,
                                interp_index=idx, interp_weight=w)
        assert masks.shape == (b * m, 3, n)
        assert ious.shape == (b * m, 3)
        assert bool(jnp.isfinite(masks).all()) and bool(
            jnp.isfinite(ious).all())
