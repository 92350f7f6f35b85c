"""Multi-device sharded geometry vs single-device results (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from point_sam_tpu import ops
from point_sam_tpu.parallel import make_mesh
from point_sam_tpu.parallel.sharded_geometry import (
    sharded_knn,
    sharded_min_sq_dist_to_complement,
)


class TestShardedKNN:
    def test_matches_single_device(self, rng):
        mesh = make_mesh()
        B, Nq, Nk, k = 2, 64, 1024, 8
        q = jnp.asarray(rng.standard_normal((B, Nq, 3)).astype(np.float32))
        keys = jnp.asarray(rng.standard_normal((B, Nk, 3)).astype(np.float32))
        keys_sh = jax.device_put(keys, NamedSharding(mesh, P(None, "data")))

        d_sh, i_sh = sharded_knn(q, keys_sh, k, mesh, method="exact")
        d_ref, i_ref = ops.knn(q, keys, k, method="exact")
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                                   atol=1e-5)
        # Indices agree where distances are tie-free.
        agree = (np.asarray(i_sh) == np.asarray(i_ref)).mean()
        assert agree > 0.99


class TestShardedBorderDistance:
    def test_matches_single_device(self, rng):
        mesh = make_mesh()
        B, R, N = 1, 2, 512
        coords = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        regions = jnp.asarray(rng.random((B, R, N)) < 0.4)

        ref = ops.min_sq_dist_to_complement(coords, regions, key_tile=128)

        c_sh = jax.device_put(coords, NamedSharding(mesh, P(None, "data")))
        r_sh = jax.device_put(regions, NamedSharding(mesh, P(None, None, "data")))
        got = sharded_min_sq_dist_to_complement(
            c_sh, r_sh, coords, regions, mesh
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
