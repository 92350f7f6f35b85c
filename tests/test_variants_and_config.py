"""Tests for the voronoi/hier model variants and the config system."""

import jax
import jax.numpy as jnp
import numpy as np

from point_sam_tpu.models import (
    HierConfig,
    PointCloudSAMHier,
    PointCloudSAMNN,
    VoronoiConfig,
)
from point_sam_tpu.models.tokenizer import HierTokenizerConfig
from point_sam_tpu.utils.config import build_model, load_config


def make_inputs(rng, B=1, N=256, M=2):
    coords = rng.standard_normal((B, N, 3)).astype(np.float32)
    coords /= np.abs(coords).max() + 1e-3
    feats = rng.random((B, N, 3)).astype(np.float32)
    gt = np.zeros((B, M, N), bool)
    for b in range(B):
        for m in range(M):
            anchor = coords[b, rng.integers(N)]
            d = ((coords[b] - anchor) ** 2).sum(-1)
            gt[b, m] = d < np.quantile(d, 0.3)
    return jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(gt)


class TestVoronoiVariant:
    def test_train_forward(self, rng):
        coords, feats, gt = make_inputs(rng)
        B, M, N = gt.shape
        cfg = VoronoiConfig(vit="tiny", num_patches=16, hidden_dim=32,
                            prompt_iters=2)
        model = PointCloudSAMNN(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            coords, feats, gt,
        )
        outputs = model.apply(
            variables, coords, feats, gt,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        assert len(outputs) == 2
        assert outputs[0]["masks"].shape == (B * M, 3, N)
        assert outputs[1]["masks"].shape == (B * M, 1, N)
        assert np.isfinite(np.asarray(outputs[1]["masks"])).all()


class TestHierVariant:
    def test_train_forward(self, rng):
        coords, feats, gt = make_inputs(rng)
        B, M, N = gt.shape
        cfg = HierConfig(
            vit="tiny",
            tokenizer=HierTokenizerConfig(num_patches=(32, 8),
                                          patch_size=(8, 4),
                                          radius=(0.05, 0.1)),
            prompt_iters=2,
        )
        model = PointCloudSAMHier(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            coords, feats, gt,
        )
        outputs = model.apply(
            variables, coords, feats, gt,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        assert outputs[0]["masks"].shape == (B * M, 3, N)
        assert np.isfinite(np.asarray(outputs[1]["masks"])).all()


class TestConfig:
    def test_load_large(self):
        cfg = load_config("large")
        assert cfg.model.vit == "eva02_large"
        assert cfg.model.tokenizer.num_patches == 1024
        assert cfg.model.tokenizer.patch_size == 256
        assert cfg.model.prompt_iters == 5
        assert cfg.lr == 3.0e-4
        assert cfg.scheduler.milestones == [400000, 500000]
        # dataset@train_dataset group renaming + interpolation
        assert cfg.train_dataset.dataset.path == "SeaLab/partnet-shapenet"
        assert cfg.train_dataset.transforms[3]["num_samples"] == 10000
        assert cfg.project_dir == "./logs/large"

    def test_overrides(self):
        cfg = load_config(
            "large",
            overrides=["lr=1e-5", "model.prompt_iters=2",
                       "train_dataloader.batch_size=8"],
        )
        assert cfg.lr == 1e-5
        assert cfg.model.prompt_iters == 2
        assert cfg.train_dataloader.batch_size == 8

    def test_build_model_all_variants(self):
        import yaml
        from point_sam_tpu.utils.config import CONFIG_ROOT

        for name, cls_name in [
            ("base", "PointCloudSAM"),
            ("large", "PointCloudSAM"),
            ("giant", "PointCloudSAM"),
            ("voronoi", "PointCloudSAMNN"),
            ("voronoi_giant", "PointCloudSAMNN"),
            ("hier", "PointCloudSAMHier"),
            ("enc_with_radius", "PointCloudSAM"),
        ]:
            with open(CONFIG_ROOT / "model" / f"{name}.yaml") as f:
                mc = yaml.safe_load(f)
            model = build_model(mc, dtype=jnp.float32)
            assert type(model).__name__ == cls_name

    def test_build_model_runs(self, rng):
        import yaml
        from point_sam_tpu.utils.config import CONFIG_ROOT

        with open(CONFIG_ROOT / "model" / "tiny.yaml") as f:
            mc = yaml.safe_load(f)
        model = build_model(mc, dtype=jnp.float32)
        coords, feats, gt = make_inputs(rng)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
            coords, feats, gt,
        )
        outputs = model.apply(
            variables, coords, feats, gt,
            rngs={"sampler": jax.random.PRNGKey(2)},
        )
        assert len(outputs) == 3
