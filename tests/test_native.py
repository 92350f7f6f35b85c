"""Native C++ library vs the JAX ops (independent implementations must agree)."""

import numpy as np
import jax.numpy as jnp
import pytest

from point_sam_tpu import ops
from point_sam_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.have_native():
        pytest.skip("no C++ toolchain available")


class TestNativeGeometry:
    def test_fps_matches_jax(self, rng):
        pts = rng.standard_normal((3000, 3)).astype(np.float32)
        got = native.fps_cpu(pts, 64)
        want = np.asarray(ops.fps_xla(jnp.asarray(pts[None]), 64))[0]
        assert (got == want).all()

    def test_knn_matches_jax(self, rng):
        q = rng.standard_normal((50, 3)).astype(np.float32)
        k = rng.standard_normal((500, 3)).astype(np.float32)
        d2, idx = native.knn_cpu(q, k, 8)
        jd, ji = ops.knn(jnp.asarray(q[None]), jnp.asarray(k[None]), 8,
                         method="exact")
        np.testing.assert_allclose(d2, np.asarray(jd)[0], atol=1e-4)
        # sets must agree (ties may reorder)
        for i in range(50):
            assert set(idx[i]) == set(np.asarray(ji)[0, i])

    def test_chamfer_matches_numpy(self, rng):
        s = rng.standard_normal((200, 3)).astype(np.float32)
        t = rng.standard_normal((300, 3)).astype(np.float32)
        got = native.chamfer_cpu(s, t)
        want = ((s[:, None] - t[None]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_normalize(self, rng):
        pts = rng.standard_normal((1000, 3)).astype(np.float32) * 5 + 2
        out, shift, scale = native.normalize_cpu(pts)
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1).max(), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(out * scale + shift, pts, atol=1e-3)
