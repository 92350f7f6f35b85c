"""Dataset construction + fixed-shape batch iteration.

Equivalent of the reference's dataset plumbing: HF hub parquet repos with
column renames xyz/rgb/mask -> coords/features/gt_masks and a per-example
transform chain (reference: train.py:25-55), plus ConcatDataset mixtures
(train.py:48-55). Adds a ``synthetic`` source for zero-egress environments.

The batcher produces fixed-shape numpy batches (coords [B,N,3],
features [B,N,C], gt_masks [B,M,N]) ready for device_put — the transform
chain guarantees N and M are constant, so every training step hits the same
compiled executable.
"""

from __future__ import annotations

import numpy as np

from .synthetic import SyntheticDataset
from .transforms import build_transforms

_HF_RENAMES = {"xyz": "coords", "rgb": "features", "mask": "gt_masks"}


class HFDataset:
    """Thin adapter over a huggingface ``datasets`` split (reference
    train.py:25-47). Network access required; import deferred."""

    def __init__(self, path: str, split: str = "train", transform=None,
                 **load_kwargs):
        import datasets as hfd

        ds = hfd.load_dataset(path, split=split, **load_kwargs)
        renames = {k: v for k, v in _HF_RENAMES.items() if k in ds.column_names}
        if renames:
            ds = ds.rename_columns(renames)
        self.ds = ds.select_columns(["coords", "features", "gt_masks"])
        self.transform = transform

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        ex = {k: np.asarray(v) for k, v in self.ds[int(i)].items()}
        return self.transform(ex) if self.transform else ex


class ConcatDataset:
    """(reference train.py:48-55 uses torch ConcatDataset over a mixture)."""

    def __init__(self, datasets: list):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, i):
        if not 0 <= i < len(self):
            raise IndexError(i)
        d = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.datasets[d][i - int(self.offsets[d])]


def build_dataset(ds_cfg: dict, *, seed: int = 0,
                  context: dict | None = None):
    """Build one dataset (or a mixture) from a configs/dataset/*.yaml dict.

    ``context`` carries run-level interpolation vars (``num_samples``) into
    standalone group loads for mixtures (reference configs interpolate
    ``${num_samples}`` from the run config, configs/base.yaml:9).
    """
    if "dataset_dict" in ds_cfg:
        from ..utils.config import load_config

        parts = []
        for _, item in ds_cfg["dataset_dict"].items():
            sub = load_config(f"dataset/{item}", context=context)
            parts.append(build_dataset(sub, seed=seed, context=context))
        return ConcatDataset(parts)

    spec = dict(ds_cfg["dataset"])
    transform = build_transforms(
        ds_cfg.get("transforms", []), rng=np.random.default_rng(seed)
    )
    source = spec.pop("source", "hf")
    if source == "synthetic":
        return SyntheticDataset(
            num_scenes=spec.get("num_scenes", 512),
            points_per_scene=spec.get("points_per_scene", 32768),
            seed=spec.get("seed", 0),
            transform=transform,
        )
    if source == "hf":
        spec.pop("token", None)
        return HFDataset(transform=transform, **spec)
    raise ValueError(f"unknown dataset source {source!r}")


class FlatMaskDataset:
    """One (cloud, mask) pair per row, via a precomputed flat index.

    Equivalent of the reference's ``FuseDatasetVal`` with its
    (point, mask) mapping npy (pc_sam/datasets/fuse_data.py:195-240,
    preprocess_mapping.py): validation iterates every instance mask of
    every scene exactly once, deterministically.
    """

    def __init__(self, dataset, mapping=None):
        self.dataset = dataset
        if mapping is None:
            from .preprocess import build_val_mapping

            mapping = build_val_mapping(dataset)
        self.mapping = np.asarray(mapping)

    def __len__(self):
        return len(self.mapping)

    def __getitem__(self, i):
        scene_idx, mask_idx = self.mapping[i]
        ex = dict(self.dataset[int(scene_idx)])
        ex["gt_masks"] = np.asarray(ex["gt_masks"])[int(mask_idx)][None]
        return ex


class BatchIterator:
    """Shuffling fixed-shape batcher (replaces torch DataLoader,
    reference train.py:129-134). Single-process; the per-example transforms
    are cheap numpy ops and the device step dominates."""

    def __init__(self, dataset, batch_size: int, *, shuffle=True,
                 drop_last=True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs if self.drop_last else 0)
        for s in range(0, end, bs):
            idx = order[s : s + bs]
            examples = [self.dataset[int(i)] for i in idx]
            yield {
                k: np.stack([e[k] for e in examples]) for k in examples[0]
            }
