"""Tests for transforms, synthetic dataset, PLY IO and the batch iterator."""

import numpy as np
import pytest

from point_sam_tpu.datasets import build as dbuild
from point_sam_tpu.datasets import transforms as T
from point_sam_tpu.datasets.synthetic import SyntheticDataset, generate_scene
from point_sam_tpu.utils import ply


def make_example(rng, n=1000, m=3):
    return dict(
        coords=rng.standard_normal((n, 3)) * 5 + 2,
        features=rng.integers(0, 256, (n, 3)).astype(np.float64),
        gt_masks=rng.random((m, n)) < 0.3,
    )


class TestMixtureConfigs:
    """Every reference configs/dataset mixture has a loadable counterpart
    (reference configs/dataset/{mixture,ground_truth,partnet+*}.yaml)."""

    MIXTURES = {
        "mixture": 5,
        "ground_truth": 5,
        "partnet+scannet": 2,
        "partnet+shapenet": 2,
        "partnet+shapenet+scannet": 4,
    }

    @pytest.mark.parametrize("name,n_parts", sorted(MIXTURES.items()))
    def test_mixture_config_resolves(self, name, n_parts):
        from point_sam_tpu.utils.config import load_config

        cfg = load_config(f"dataset/{name}", context={"num_samples": 1024})
        parts = cfg["dataset_dict"]
        assert len(parts) == n_parts
        # Every referenced group file parses standalone and carries a
        # buildable dataset spec + transform chain.
        for item in parts.values():
            sub = load_config(f"dataset/{item}", context={"num_samples": 1024})
            assert "dataset" in sub and "transforms" in sub
            assert sub["dataset"].get("source", "hf") in ("hf", "synthetic")

    def test_mixture_builds_offline(self):
        """build_dataset concatenates mixtures (synthetic stand-ins, since
        HF hub repos are unreachable in tests)."""
        ds = dbuild.build_dataset(
            {"dataset_dict": {"a": "synthetic", "b": "synthetic"}},
            context={"num_samples": 128},
        )
        assert len(ds) == 2 * len(
            dbuild.build_dataset(
                {"dataset_dict": {"a": "synthetic"}},
                context={"num_samples": 128},
            )
        )


class TestParallelLoader:
    """Threaded prefetching BatchIterator (VERDICT r1 next-round #6)."""

    def _dataset(self, n=16, slow_s=0.0):
        import time as _time

        ds = SyntheticDataset(num_scenes=n, points_per_scene=512, seed=0)
        chain = T.build_transforms(
            [{"name": "normalize_points"},
             {"name": "random_sample_mask", "num_samples": 2},
             {"name": "random_sample", "num_samples": 128},
             {"name": "random_rotate_along_axis"}],
            rng=np.random.default_rng(0),
        )
        if slow_s:
            slow = lambda ex: (_time.sleep(slow_s), ex)[1]  # noqa: E731
            chain.transforms.append(slow)
        ds.transform = chain
        return ds

    def test_deterministic_across_worker_counts(self):
        batches = {}
        for workers in (0, 4):
            it = dbuild.BatchIterator(
                self._dataset(), 4, shuffle=True, seed=7,
                num_workers=workers,
            )
            batches[workers] = list(it)
        assert len(batches[0]) == len(batches[4]) == 4
        for b0, b4 in zip(batches[0], batches[4]):
            for k in b0:
                np.testing.assert_array_equal(b0[k], b4[k])

    def test_epochs_differ_and_are_reproducible(self):
        it1 = dbuild.BatchIterator(self._dataset(), 4, seed=7, num_workers=2)
        e0, e1 = list(it1), list(it1)  # two epochs
        changed = any(
            not np.array_equal(a["coords"], b["coords"])
            for a, b in zip(e0, e1)
        )
        assert changed, "epoch 2 identical to epoch 1 (rng not advancing)"
        it2 = dbuild.BatchIterator(self._dataset(), 4, seed=7, num_workers=2)
        for a, b in zip(e0, list(it2)):
            np.testing.assert_array_equal(a["coords"], b["coords"])

    def test_prefetch_overlaps_slow_transforms(self):
        """With a deliberately slow transform, the threaded loader's wall
        time must be well under the serial sum (the VERDICT 'Done'
        criterion: loader work overlaps)."""
        import time as _time

        slow_s = 0.02
        n = 16
        t0 = _time.perf_counter()
        list(dbuild.BatchIterator(self._dataset(n, slow_s), 4, seed=0,
                                  num_workers=8, prefetch=2))
        threaded = _time.perf_counter() - t0
        serial_floor = n * slow_s
        assert threaded < serial_floor * 0.75, (
            f"threaded epoch {threaded:.3f}s vs serial floor "
            f"{serial_floor:.3f}s — no overlap"
        )


class TestTransforms:
    def test_normalize_points_unit_sphere(self, rng):
        ex = T.NormalizePoints()(make_example(rng))
        norms = np.linalg.norm(ex["coords"], axis=1)
        assert abs(norms.max() - 1.0) < 1e-6
        np.testing.assert_allclose(ex["coords"].mean(0), 0, atol=1e-6)

    def test_normalize_color(self, rng):
        ex = make_example(rng)
        ex = T.NormalizeColor(mean=0.5, std=0.5)(ex)
        assert ex["features"].min() >= -1.0 - 1e-9
        assert ex["features"].max() <= 1.0 + 1e-9

    def test_random_sample_shapes_and_fg_guarantee(self, rng):
        ex = make_example(rng, n=5000)
        # Make mask 0 tiny so naive subsampling could miss all fg.
        ex["gt_masks"][:] = False
        ex["gt_masks"][0, :3] = True
        t = T.RandomSample(100, rng=np.random.default_rng(0))
        out = t(dict(ex))
        assert out["coords"].shape == (100, 3)
        assert out["gt_masks"].shape[1] == 100
        # Foreground guarantee: some mask has a foreground point.
        assert out["gt_masks"].any()
        # Empty-mask replacement: no all-empty masks remain.
        assert (out["gt_masks"].sum(1) > 0).all()

    def test_random_sample_mask_pads_and_selects(self, rng):
        ex = make_example(rng, m=2)
        out = T.RandomSampleMask(4, rng=np.random.default_rng(0))(dict(ex))
        assert out["gt_masks"].shape[0] == 4
        out = T.RandomSampleMask(1, rng=np.random.default_rng(0))(dict(ex))
        assert out["gt_masks"].shape[0] == 1

    def test_rotations_preserve_norms(self, rng):
        ex = make_example(rng)
        before = np.linalg.norm(ex["coords"], axis=1)
        for t in (T.RandomRotateAlongAxis(rng=np.random.default_rng(1)),
                  T.RandomRotatePerturb(rng=np.random.default_rng(2))):
            ex = t(ex)
        after = np.linalg.norm(ex["coords"], axis=1)
        np.testing.assert_allclose(before, after, rtol=1e-9)

    def test_euler_matrix_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        angles = rng.uniform(-0.18, 0.18, 3)
        want = Rotation.from_euler("XYZ", angles).as_matrix()
        got = T._euler_matrix("XYZ", np.rad2deg(angles))
        np.testing.assert_allclose(got, want, atol=1e-10)
        a = rng.uniform(-180, 180)
        want = Rotation.from_euler("y", a, degrees=True).as_matrix()
        np.testing.assert_allclose(T._euler_matrix("y", a), want, atol=1e-10)

    def test_build_transforms_from_config(self, rng):
        specs = [
            {"name": "normalize_points"},
            {"name": "normalize_color", "mean": 0.5, "std": 0.5},
            {"name": "random_sample_mask", "num_samples": 2},
            {"name": "random_sample", "num_samples": 256},
            {"name": "random_scale", "low": 0.8, "high": 1.0},
            {"name": "random_rotate_perturb"},
            {"name": "random_rotate_along_axis"},
        ]
        t = T.build_transforms(specs, rng=np.random.default_rng(0))
        out = t(make_example(rng))
        assert out["coords"].shape == (256, 3)
        assert out["coords"].dtype == np.float32
        assert out["gt_masks"].shape == (2, 256)
        assert out["gt_masks"].dtype == bool


class TestSynthetic:
    def test_deterministic(self):
        a = generate_scene(7, num_points=512)
        b = generate_scene(7, num_points=512)
        np.testing.assert_array_equal(a["coords"], b["coords"])
        assert a["coords"].shape == (512, 3)
        # Masks partition the cloud.
        assert (a["gt_masks"].sum(0) == 1).all()

    def test_dataset_with_transform(self):
        t = T.build_transforms(
            [{"name": "normalize_points"},
             {"name": "random_sample_mask", "num_samples": 2},
             {"name": "random_sample", "num_samples": 128}],
            rng=np.random.default_rng(0),
        )
        ds = SyntheticDataset(num_scenes=4, points_per_scene=1024, transform=t)
        ex = ds[0]
        assert ex["coords"].shape == (128, 3)
        assert ex["gt_masks"].shape == (2, 128)


class TestBatchIterator:
    def test_shapes_and_drop_last(self):
        t = T.build_transforms(
            [{"name": "random_sample_mask", "num_samples": 2},
             {"name": "random_sample", "num_samples": 64}],
            rng=np.random.default_rng(0),
        )
        ds = SyntheticDataset(num_scenes=5, points_per_scene=256, transform=t)
        it = dbuild.BatchIterator(ds, 2, shuffle=True, drop_last=True)
        batches = list(it)
        assert len(batches) == 2
        assert batches[0]["coords"].shape == (2, 64, 3)
        assert batches[0]["gt_masks"].shape == (2, 2, 64)

    def test_concat_dataset(self):
        d1 = SyntheticDataset(num_scenes=3, points_per_scene=128)
        d2 = SyntheticDataset(num_scenes=2, points_per_scene=128, seed=1)
        cat = dbuild.ConcatDataset([d1, d2])
        assert len(cat) == 5
        np.testing.assert_array_equal(cat[3]["coords"], d2[0]["coords"])
        with pytest.raises(IndexError):
            cat[5]


class TestPLY:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, rng, tmp_path, binary):
        xyz = rng.standard_normal((100, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (100, 3)).astype(np.uint8)
        p = tmp_path / "t.ply"
        ply.save_ply(p, xyz, rgb, binary=binary)
        xyz2, rgb2 = ply.load_ply(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-5)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_no_color(self, rng, tmp_path):
        xyz = rng.standard_normal((10, 3)).astype(np.float32)
        p = tmp_path / "t.ply"
        ply.save_ply(p, xyz)
        xyz2, rgb2 = ply.load_ply(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
        assert rgb2 is None

    def test_visualizers(self, rng, tmp_path):
        xyz = rng.standard_normal((50, 3)).astype(np.float32)
        mask = rng.random(50) < 0.5
        ply.visualize_mask(tmp_path / "m.ply", xyz, mask)
        ply.visualize_prompts(
            tmp_path / "p.ply", xyz, xyz[:2], np.array([True, False])
        )
        assert (tmp_path / "m.ply").exists()
