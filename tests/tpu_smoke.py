"""On-TPU compiled-kernel smoke suite (VERDICT r2 missing #5 / next #6).

All Pallas kernels are covered by the CPU test suite in *interpret* mode
only — a Mosaic regression (tile constraint, VMEM limit, lowering bug)
would surface at runtime as a silent ``ops._warn.warn_fallback`` perf
cliff, not a test failure. This module compiles every kernel for REAL on
the attached TPU at flagship shapes, asserts numerics against the plain
XLA references, and exits non-zero on any failure — including a fallback:
kernel entry points are called directly so a Mosaic error raises instead
of being swallowed by the dispatch wrappers.

Run (part of the bench ritual, see CLAUDE.md):

    python -m tests.tpu_smoke            # ~1-2 min incl. compiles

Covers: fps_pallas, mha_pallas (+ custom VJP), interp_weights_pallas,
patch_encoder_fused fwd + fused bwd — at the eval config (N=100k, G=2048,
K=256, ViT-L attention) and the train config's mask-encoder shape —
upscale_hyper_fused (the decode upscale tail at B*M=8, N=100k), plus
the approx-kNN precision/recall calibration check (clustered cloud,
rt=0.9) and the binned-kNN check (skipped when the retired
ops.knn_pallas module is absent).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"tpu_smoke: default backend is '{backend}', not 'tpu' — "
              "this suite only proves anything on real hardware. Aborting.")
        sys.exit(2)
    print(f"tpu_smoke: backend={backend} devices={jax.devices()}")


_FAILURES: list[str] = []


def _check(name, fn):
    """Run one kernel check; record (not raise) failures so one broken
    kernel doesn't hide the state of the others."""
    t0 = time.perf_counter()
    try:
        detail = fn()
        dt = time.perf_counter() - t0
        print(f"  PASS {name:34s} {detail}  [{dt:.1f}s incl. compile]")
    except Exception as e:  # noqa: BLE001 — report and keep going
        dt = time.perf_counter() - t0
        _FAILURES.append(name)
        print(f"  FAIL {name:34s} [{dt:.1f}s] {type(e).__name__}: {e}")


def check_fps():
    import jax.numpy as jnp

    from point_sam_tpu.ops.fps import fps_xla
    from point_sam_tpu.ops.fps_pallas import fps_pallas

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((2, 100_000, 3)), jnp.float32)
    valid = jnp.asarray(
        np.arange(100_000)[None, :] < np.array([[100_000], [97_531]]))
    got = np.asarray(fps_pallas(pts, 2048, valid=valid))
    want = np.asarray(fps_xla(pts, 2048, valid=valid))
    if not np.array_equal(got, want):
        n = int((got != want).sum())
        raise AssertionError(
            f"fps_pallas != fps_xla on {n}/{got.size} selections")
    return "bit-exact vs fps_xla  [B=2, N=100k, G=2048, ragged valid]"


def check_fps_interp():
    """Fused FPS + 3-NN: selection bit-exact vs fps_xla; the interp triplet
    bit-exact (indices) vs the dedicated interp kernel."""
    import jax.numpy as jnp

    from point_sam_tpu.ops.fps import fps_xla
    from point_sam_tpu.ops.fps_pallas import fps_interp_pallas
    from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((1, 100_000, 3)), jnp.float32)
    fps_idx, ctr, idx, d2 = fps_interp_pallas(pts, 2048, with_centers=True)
    want_fps = np.asarray(fps_xla(pts, 2048))
    if not np.array_equal(np.asarray(fps_idx), want_fps):
        n = int((np.asarray(fps_idx) != want_fps).sum())
        raise AssertionError(f"fps selections differ on {n}/{want_fps.size}")
    centers = jnp.take_along_axis(pts, jnp.asarray(want_fps)[..., None],
                                  axis=1)
    if not np.array_equal(np.asarray(ctr), np.asarray(centers)):
        raise AssertionError("kernel centers != gathered centers")
    want_idx, want_w = interp_weights_pallas(pts, centers)
    imatch = float((np.asarray(idx) == np.asarray(want_idx)).mean())
    inv = 1.0 / np.maximum(np.asarray(d2, np.float64), 1e-8)
    w = inv / inv.sum(-1, keepdims=True)
    wdiff = float(np.abs(w - np.asarray(want_w, np.float64)).max())
    assert imatch == 1.0, f"3-NN index match {imatch:.6f}"
    assert wdiff < 1e-5, f"weight diff {wdiff:.2e}"
    return (f"fps bit-exact, idx match {imatch:.6f}, w diff {wdiff:.1e}"
            "  [N=100k, G=2048]")


def check_fps_interp_knn():
    """Whole-geometry fusion (FPS + centers + 3-NN interp + binned kNN in
    one VMEM pass) at the flagship eval shape: selection/centers/interp
    bit-exact vs the dedicated kernels; binned-kNN recall vs exact."""
    import jax
    import jax.numpy as jnp

    from point_sam_tpu.ops.distance import sq_dist
    from point_sam_tpu.ops.fps_pallas import (
        fps_interp_knn_pallas,
        fps_interp_pallas,
    )

    rng = np.random.default_rng(11)
    G, N, K = 2048, 100_000, 256
    # Clustered cloud — the adversarial case for binned top-k recall.
    cc = rng.standard_normal((64, 3)) * 0.4
    pick = rng.integers(0, 64, size=N)
    pts = jnp.asarray(cc[pick] + rng.standard_normal((N, 3)) * 0.02,
                      jnp.float32)[None]
    fps_idx, ctr, idx, d2, knn_idx = fps_interp_knn_pallas(pts, G, K)
    want_fps, want_idx, want_d2 = fps_interp_pallas(pts, G)
    assert np.array_equal(np.asarray(fps_idx), np.asarray(want_fps)), \
        "fps selections differ from fps_interp_pallas"
    want_ctr = np.take_along_axis(
        np.asarray(pts), np.asarray(want_fps)[..., None], axis=1)
    assert np.array_equal(np.asarray(ctr), want_ctr), "centers differ"
    imatch = float((np.asarray(idx) == np.asarray(want_idx)).mean())
    assert imatch == 1.0, f"3-NN idx match {imatch:.6f}"
    assert np.array_equal(np.asarray(d2), np.asarray(want_d2)), \
        "interp distances differ"
    # kNN recall vs exact (row-block oracle).
    q = jnp.asarray(want_ctr)
    top = jax.jit(lambda qc: jax.lax.top_k(-sq_dist(qc, pts), K)[1])
    exact_rows = [np.asarray(top(q[:, s:s + 512]))[0]
                  for s in range(0, G, 512)]
    ie = np.concatenate(exact_rows, 0)
    ia = np.asarray(knn_idx)[0]
    rec = np.mean([
        len(np.intersect1d(ia[g], ie[g])) / K for g in range(0, G, 8)
    ])
    # Expected binned recall ~0.969 at 4096 bins; clustered clouds land
    # lower. Floor matches the approx_min_k rt=0.9 contract.
    assert rec >= 0.905, f"fused binned-kNN recall {rec:.3f} < 0.905 floor"
    return (f"fps/interp bit-exact, knn recall {rec:.3f}  "
            "[N=100k, G=2048, K=256]")


def check_mha():
    import jax
    import jax.numpy as jnp

    from point_sam_tpu.ops.attention import (
        mha_pallas, mha_pallas_ad, mha_reference)

    rng = np.random.default_rng(1)
    shape = (1, 16, 2048, 64)  # ViT-L: 16 heads, dh=64, S=G=2048
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32)
               .astype(jnp.bfloat16) for _ in range(3))
    got = np.asarray(mha_pallas(q, k, v), np.float32)
    want = np.asarray(mha_reference(q, k, v), np.float32)
    scale = np.abs(want).max()
    diff = np.abs(got - want).max() / scale
    assert diff < 2e-2, f"fwd rel diff {diff:.2e} (bf16 tol 2e-2)"

    # VJP: grads of a scalar loss through the Pallas fwd vs the reference.
    loss_p = lambda a, b, c: jnp.sum(
        mha_pallas_ad(a, b, c).astype(jnp.float32) ** 2)
    loss_r = lambda a, b, c: jnp.sum(
        mha_reference(a, b, c).astype(jnp.float32) ** 2)
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    gdiff = max(
        float(np.abs(np.asarray(a, np.float32)
                     - np.asarray(b, np.float32)).max()
              / max(np.abs(np.asarray(b, np.float32)).max(), 1e-6))
        for a, b in zip(gp, gr))
    assert gdiff < 5e-2, f"vjp rel diff {gdiff:.2e}"
    return f"fwd rel {diff:.1e}, vjp rel {gdiff:.1e}  [1x16x2048x64 bf16]"


def check_interp():
    import jax.numpy as jnp

    import jax

    from point_sam_tpu.ops.interp_pallas import interp_weights_pallas

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 100_000, 3)), jnp.float32)
    key = jnp.asarray(rng.standard_normal((1, 2048, 3)), jnp.float32)
    gi, gw = interp_weights_pallas(q, key)

    @jax.jit
    def exact(q, key):  # inline exact oracle (common.py:238-255 semantics)
        d2 = jnp.sum((q[:, :, None, :] - key[:, None, :, :]) ** 2, axis=-1)
        d2k, idx = jax.lax.top_k(-d2, 3)
        inv = 1.0 / jnp.maximum(-d2k, 1e-8)
        return idx, inv / jnp.sum(inv, axis=-1, keepdims=True)

    wi, ww = exact(q, key)
    idx_match = float(np.mean(np.asarray(gi) == np.asarray(wi)))
    wdiff = np.abs(np.asarray(gw) - np.asarray(ww)).max()
    # Primary gate: the EXACT distances of the selected neighbors must
    # match the oracle's 3 smallest (robust to same-distance index swaps).
    sel = np.take_along_axis(
        np.asarray(key)[0], np.asarray(gi)[0].reshape(-1, 1), axis=0
    ).reshape(-1, 3, 3)
    d_sel = np.sort(((np.asarray(q)[0][:, None, :] - sel) ** 2).sum(-1), -1)
    d_ora = np.sort(np.asarray(
        ((q[0][:, None, :] - key[0][None]) ** 2).sum(-1)
    ), axis=-1)[:, :3]
    drel = np.abs(d_sel - d_ora).max() / max(d_ora.max(), 1e-9)
    assert drel < 1e-5, f"selected-neighbor distance rel diff {drel:.2e}"
    assert idx_match > 0.999, f"idx match only {idx_match:.6f}"
    assert wdiff < 1e-3, f"weight diff {wdiff:.2e}"
    return (f"idx match {idx_match:.6f}, w diff {wdiff:.1e}, "
            f"d rel {drel:.1e}  [N=100k, G=2048]")


def _pe_params(rng, c_in, h0, h1, c_out):
    import jax.numpy as jnp

    def m(i, o):
        return jnp.asarray(
            rng.standard_normal((i, o)) / np.sqrt(i), jnp.float32)

    def vz(n, one=False):
        return (jnp.ones(n, jnp.float32) if one
                else jnp.asarray(rng.standard_normal(n) * 0.02, jnp.float32))

    return (m(c_in, h0), vz(h0), vz(h0, one=True), vz(h0),
            m(h0, h0), vz(h0),
            m(2 * h0, h1), vz(h1), vz(h1, one=True), vz(h1),
            m(h1, c_out), vz(c_out))


def check_patch_encoder(g, k, c_in, label):
    import jax.numpy as jnp

    from point_sam_tpu.ops.patch_encoder_pallas import (
        patch_encoder_fused,
        patch_encoder_fused_bwd,
        patch_encoder_reference,
    )

    rng = np.random.default_rng(3)
    h0, h1, c_out = 128, 512, 512
    params = _pe_params(rng, c_in, h0, h1, c_out)
    grouped = jnp.asarray(
        rng.standard_normal((1, g * k, c_in)), jnp.float32
    ).astype(jnp.bfloat16)

    got = np.asarray(patch_encoder_fused(
        grouped, params, num_groups=g, group_size=k, cdt=jnp.bfloat16),
        np.float32)
    want = np.asarray(patch_encoder_reference(
        grouped, params, num_groups=g, group_size=k, cdt=jnp.bfloat16),
        np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    fdiff = np.abs(got - want).max() / scale
    assert fdiff < 2e-2, f"fwd rel diff {fdiff:.2e}"

    import jax

    # bf16 (the training dtype): element-wise bwd comparison is meaningless
    # — 1-ulp activation differences between the kernel's and XLA's matmul
    # tilings flip max-pool argmax rows, rerouting whole grad rows. Check
    # the fp32 compile instead (ties vanish; agreement ~1e-7 measured) and
    # assert the bf16 grads are finite.
    dout = jnp.asarray(rng.standard_normal(want.shape), jnp.float32)
    dxb, dpb = patch_encoder_fused_bwd(
        grouped, params, dout.astype(jnp.bfloat16),
        num_groups=g, group_size=k, cdt=jnp.bfloat16)
    for t in (dxb, *dpb):
        assert np.isfinite(np.asarray(t, np.float32)).all(), \
            "bf16 fused bwd produced non-finite grads"

    g32 = grouped.astype(jnp.float32)
    with jax.default_matmul_precision("highest"):
        dx, dparams = patch_encoder_fused_bwd(
            g32, params, dout, num_groups=g, group_size=k,
            cdt=jnp.float32, rows_target=2048)

        def ref_loss(gr, ps):
            out = patch_encoder_reference(
                gr, ps, num_groups=g, group_size=k, cdt=jnp.float32)
            return jnp.sum(out * dout)

        rx, rparams = jax.jit(jax.grad(ref_loss, argnums=(0, 1)))(
            g32, params)
    # dx: 1-ulp activation differences between Mosaic and XLA matmul
    # tilings still flip a handful of argmax rows at fp32 — gate on the
    # FRACTION of off elements (a real bwd bug is dense), plus a dense
    # small-noise bound. dparams: accumulation-order noise grows with the
    # number of sequentially-accumulated grid tiles; gate at 1e-2.
    rx_n = np.asarray(rx)
    d = np.abs(np.asarray(dx) - rx_n)
    frac_off = float((d > 1e-4 * np.abs(rx_n).max()).mean())
    assert frac_off < 5e-3, f"fp32 dx: {frac_off:.2%} elements off"
    # A flipped pool row moves that row's whole outer-product contribution
    # between param-grad entries — measured up to ~2e-2 rel at the eval
    # shape's 524k rows. A formula/lowering bug shows as O(1) rel.
    bdiff = 0.0
    for dp, rp in zip(dparams, rparams):
        bdiff = max(bdiff, float(
            np.abs(np.asarray(dp) - np.asarray(rp)).max()
            / max(np.abs(np.asarray(rp)).max(), 1e-6)))
    assert bdiff < 5e-2, f"fp32 dparam rel diff {bdiff:.2e}"

    # The XLA-recompute fallback itself (jax.vjp of the reference wrt
    # inputs AND params, bf16) regressed to NaN on XLA:TPU via chained
    # reduce_max grads — guard grad_safe_max keeps it finite.
    def fb_loss(gr, ps):
        out = patch_encoder_reference(
            gr, ps, num_groups=g, group_size=k, cdt=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32)
                       * dout.astype(jnp.float32))

    fx, fparams = jax.jit(jax.grad(fb_loss, argnums=(0, 1)))(
        grouped, params)
    for t in (fx, *fparams):
        assert np.isfinite(np.asarray(t, np.float32)).all(), \
            "XLA fallback bwd produced non-finite grads (grad_safe_max " \
            "regression)"
    return (f"fwd rel {fdiff:.1e}, fp32 bwd rel {bdiff:.1e}, "
            f"bf16 bwd+fallback finite  [{label}]")


def check_mha_packed():
    import jax
    import jax.numpy as jnp

    import point_sam_tpu.ops.attention as A

    rng = np.random.default_rng(5)
    B, S, H, dh = 1, 2048, 16, 64  # ViT-L flat layout
    D = H * dh
    q, k, v = (jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
               .astype(jnp.bfloat16) for _ in range(3))
    got = np.asarray(A.mha_packed_pallas(q, k, v, H), np.float32)
    sh = lambda t: t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)  # noqa: E731
    want = np.asarray(
        A.mha_reference(sh(q), sh(k), sh(v)).transpose(0, 2, 1, 3)
        .reshape(B, S, D), np.float32)
    scale = np.abs(want).max()
    diff = np.abs(got - want).max() / scale
    assert diff < 2e-2, f"fwd rel diff {diff:.2e} (bf16 tol 2e-2)"

    loss = lambda a, b, c: jnp.sum(  # noqa: E731
        A.mha_packed_ad(a, b, c, H).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for t in g:
        assert np.isfinite(np.asarray(t, np.float32)).all()

    # Fused Pallas backward vs the einsum backward, compiled on-chip.
    do = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32
                     ).astype(jnp.bfloat16)
    gk = A.mha_packed_bwd_pallas(q, k, v, do, H)
    qh, kh, vh = (A._split_heads(t, H) for t in (q, k, v))
    ge = A._mha_bwd((qh, kh, vh), A._split_heads(do, H))
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(B, S, D)  # noqa: E731
    bdiffs = []
    for a, b in zip(gk, (merge(x) for x in ge)):
        an, bn = np.asarray(a, np.float32), np.asarray(b, np.float32)
        bdiffs.append(np.abs(an - bn).max() / max(np.abs(bn).max(), 1e-6))
    assert max(bdiffs) < 2e-2, f"fused bwd rel diffs {bdiffs}"
    return (f"fwd rel {diff:.1e}, fused bwd rel {max(bdiffs):.1e}  "
            "[B,S,D]=[1,2048,1024] H=16")


def check_knn_approx():
    """The shipping tokenizer kNN (approx_min_k, precision='high' distance
    stream) must hold clustered-scene recall ON THE REAL CHIP at the
    flagship shape. This hazard is shape-dependent and silent: matmul
    precision 'default' lowers to exact VPU code at small shapes (CPU
    tests can't see it) but truncates inputs to bf16 in the MXU at
    2048x100k, collapsing top-256 recall to ~0.51 (round-3 on-chip
    measurement; ops/knn.py::_approx_knn docstring)."""
    import jax
    import jax.numpy as jnp

    from point_sam_tpu.ops.knn import knn

    rng = np.random.default_rng(7)
    G, N, K = 2048, 100_000, 256
    centers = rng.standard_normal((64, 3)) * 0.4
    pick = rng.integers(0, 64, size=N)
    pts = (centers[pick] + rng.standard_normal((N, 3)) * 0.02
           ).astype(np.float32)
    q = jnp.asarray(pts[rng.choice(N, G, replace=False)])[None]
    kk = jnp.asarray(pts)[None]
    _, ia = knn(q, kk, K, method="approx", recall_target=0.9)
    # exact oracle in query chunks (one [G, N] fp32 row block at a time)
    from point_sam_tpu.ops.distance import sq_dist

    exact_rows = []
    top = jax.jit(lambda qc: jax.lax.top_k(-sq_dist(qc, kk), K)[1])
    for s in range(0, G, 512):
        exact_rows.append(np.asarray(top(q[:, s:s + 512]))[0])
    ie = np.concatenate(exact_rows, 0)
    ia_n = np.asarray(ia)[0]
    rec = np.mean([
        len(np.intersect1d(ia_n[g], ie[g])) / K for g in range(0, G, 8)
    ])
    # Floor = the rt=0.9 contractual target plus a hair of slack;
    # measured 0.9614 on v5e but approx_min_k only guarantees ~0.90 and
    # other TPU generations / XLA versions may land lower.
    assert rec >= 0.905, (
        f"approx-kNN on-chip recall {rec:.3f} < 0.905 floor "
        "(rt=0.9 contract; v5e measures ~0.96 — recalibrate per hardware)"
    )
    return f"clustered recall {rec:.3f} vs exact  [G=2048, N=100k, rt=0.9]"


def check_knn_binned():
    import jax.numpy as jnp

    from point_sam_tpu.ops.knn import knn

    try:
        from point_sam_tpu.ops.knn_pallas import (
            binned_dispatch_ok, knn_binned_pallas)
    except ImportError:
        # The binned-kNN kernel was measured SLOWER than the stock
        # approx_min_k fused stream (11-12 ms vs 5.9 at equal recall; see
        # PARITY.md "Perf notes (round 3)") and removed; the gate stays so
        # the check reactivates if the kernel ever returns.
        return ("SKIPPED (ops.knn_pallas removed — measured dead end, "
                "approx_min_k path ships; PARITY.md r3 notes)")

    if not binned_dispatch_ok(2048, 100_000, 256):
        # Crash, not a clean failure, when force-compiled (see the gate's
        # docstring) — skip rather than abort the whole smoke suite.
        return "SKIPPED (dispatch gate off — kernel disabled pending Mosaic fix)"

    rng = np.random.default_rng(6)
    G, N, K = 2048, 100_000, 256
    q = jnp.asarray(rng.standard_normal((1, G, 3)) / 3.0, jnp.float32)
    kk = jnp.asarray(rng.standard_normal((1, N, 3)) / 3.0, jnp.float32)
    _, ib = knn_binned_pallas(q, kk, K, recall_target=0.9)
    _, ie = knn(q, kk, K, method="exact")
    ib_n, ie_n = np.asarray(ib)[0], np.asarray(ie)[0]
    rec = np.mean([
        len(set(ib_n[g].tolist()) & set(ie_n[g].tolist())) / K
        for g in range(0, G, 8)
    ])
    assert rec >= 0.93, f"composite recall {rec:.3f} < 0.93 floor"
    return f"set recall {rec:.3f} vs exact  [G=2048, N=100k, K=256, r=0.9]"


def check_upscale_fused():
    """Fused decode-upscale tail at the eval decode shape (B*M=8, N=100k,
    D=256, C=3) vs the XLA reference, on the real chip (bf16)."""
    import jax.numpy as jnp

    import jax

    from point_sam_tpu.ops.upscale_pallas import (
        upscale_dispatch_ok,
        upscale_hyper_fused,
        upscale_hyper_reference,
    )

    assert upscale_dispatch_ok(100_000, 256, 3, jnp.bfloat16)
    rng = np.random.default_rng(0)
    bm, n, d, c = 8, 100_000, 256, 3
    x = jnp.asarray(rng.standard_normal((bm, n, d)), jnp.bfloat16)
    params = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            rng.standard_normal(d) * 0.2 + 1.0,
            rng.standard_normal(d) * 0.1,
            rng.standard_normal((d, d)) / np.sqrt(d),
            rng.standard_normal(d) * 0.1,
        )
    )
    hyper = jnp.asarray(rng.standard_normal((bm, c, d)), jnp.bfloat16)
    got = np.asarray(upscale_hyper_fused(x, params, hyper, cdt=jnp.bfloat16))
    want = np.asarray(
        jax.jit(lambda *a: upscale_hyper_reference(*a, cdt=jnp.bfloat16))(
            x, params, hyper))
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 2e-2, f"fused upscale rel diff {rel:.4f} vs XLA reference"
    return f"rel diff {rel:.1e} vs XLA ref  [BM=8, N=100k, D=256, C=3]"


def check_interp_upscale_fused():
    """Interp-in-kernel decode tail (weighted one-hot matmul + LN-GELU-
    Dense-GELU-hyperdot) at the eval decode shape vs the XLA gather+tail
    reference, on the real chip (bf16)."""
    import jax
    import jax.numpy as jnp

    from point_sam_tpu.ops.upscale_pallas import (
        interp_upscale_dispatch_ok,
        interp_upscale_hyper_fused,
        interp_upscale_reference,
    )

    assert interp_upscale_dispatch_ok(100_000, 2048, 256, 3, jnp.bfloat16)
    rng = np.random.default_rng(1)
    b, m, g, n, d, c = 1, 8, 2048, 100_000, 256, 3
    h1 = jnp.asarray(rng.standard_normal((b * m, g, d)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, g, (b, n, 3)), jnp.int32)
    w = jnp.asarray(rng.dirichlet(np.ones(3), (b, n)), jnp.float32)
    params = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            rng.standard_normal(d) * 0.2 + 1.0,
            rng.standard_normal(d) * 0.1,
            rng.standard_normal((d, d)) / np.sqrt(d),
            rng.standard_normal(d) * 0.1,
        )
    )
    hyper = jnp.asarray(rng.standard_normal((b * m, c, d)), jnp.bfloat16)
    got = np.asarray(
        interp_upscale_hyper_fused(h1, idx, w, params, hyper,
                                   cdt=jnp.bfloat16))
    want = np.asarray(
        jax.jit(lambda *a: interp_upscale_reference(*a, cdt=jnp.bfloat16))(
            h1, idx, w, params, hyper))
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 2e-2, f"interp-fused rel diff {rel:.4f} vs XLA reference"
    return f"rel diff {rel:.1e} vs XLA ref  [BM=8, N=100k, G=2048, D=256]"


def main():
    _setup()
    print("compiling + checking kernels on the real chip:")
    _check("fps_pallas", check_fps)
    _check("fps_interp_pallas (fused)", check_fps_interp)
    _check("fps_interp_knn_pallas (geom)", check_fps_interp_knn)
    _check("mha_pallas(+vjp)", check_mha)
    _check("mha_packed(+vjp)", check_mha_packed)
    _check("knn_approx (precision=high)", check_knn_approx)
    _check("knn_binned_pallas", check_knn_binned)
    _check("interp_weights_pallas", check_interp)
    _check("patch_encoder_fused fwd+bwd (eval)",
           lambda: check_patch_encoder(2048, 256, 6, "G=2048 K=256 C=6"))
    _check("patch_encoder_fused fwd+bwd (mask)",
           lambda: check_patch_encoder(1024, 256, 4, "G=1024 K=256 C=4"))
    _check("upscale_hyper_fused (decode)", check_upscale_fused)
    _check("interp_upscale_fused (decode)", check_interp_upscale_fused)
    if _FAILURES:
        print(f"tpu_smoke: {len(_FAILURES)} FAILED: {_FAILURES}")
        sys.exit(1)
    print("tpu_smoke: all kernels compiled and verified on TPU.")


if __name__ == "__main__":
    main()
