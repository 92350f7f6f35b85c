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
        return self.get(i)

    def get(self, i, rng=None):
        """Fetch + transform one example; ``rng`` (a per-example Generator
        injected by the parallel loader) seeds the random transforms."""
        ex = {k: np.asarray(v) for k, v in self.ds[int(i)].items()}
        return _apply_transform(self.transform, ex, rng)


def _apply_transform(transform, ex, rng):
    if transform is None:
        return ex
    if rng is not None:
        ex["_rng"] = rng
    ex = transform(ex)
    ex.pop("_rng", None)
    return ex


class ConcatDataset:
    """(reference train.py:48-55 uses torch ConcatDataset over a mixture)."""

    def __init__(self, datasets: list):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, i):
        return self.get(i)

    def get(self, i, rng=None):
        if not 0 <= i < len(self):
            raise IndexError(i)
        d = int(np.searchsorted(self.offsets, i, side="right") - 1)
        j = i - int(self.offsets[d])
        sub = self.datasets[d]
        return sub.get(j, rng=rng) if hasattr(sub, "get") else sub[j]


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
        return self.get(i)

    def get(self, i, rng=None):
        scene_idx, mask_idx = self.mapping[i]
        ds = self.dataset
        ex = dict(ds.get(int(scene_idx), rng=rng) if hasattr(ds, "get")
                  else ds[int(scene_idx)])
        ex["gt_masks"] = np.asarray(ex["gt_masks"])[int(mask_idx)][None]
        return ex


class BatchIterator:
    """Shuffling fixed-shape batcher with threaded prefetch (replaces the
    torch DataLoader with 8-16 worker processes, reference train.py:129-134).

    Example fetch + transform runs on a thread pool (numpy releases the GIL,
    and so does the jitted device step the consumer blocks on), with
    ``prefetch`` whole batches assembled ahead — so host-side data work
    overlaps device compute instead of serializing with it.

    Determinism: every example is transformed with its own Generator seeded
    from ``SeedSequence([seed, epoch, index])``, so batches are bit-identical
    for any ``num_workers`` (including 0) and independent of thread
    scheduling — a stronger property than the reference's per-worker 128-bit
    seeding (pc_sam/utils/torch_utils.py:8-25), which it subsumes.
    """

    def __init__(self, dataset, batch_size: int, *, shuffle=True,
                 drop_last=True, seed: int = 0, num_workers: int | None = None,
                 prefetch: int = 2, process_index: int = 0,
                 process_count: int = 1):
        import os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # Multi-host data sharding (the Accelerate per-rank DataLoader
        # equivalent, reference train.py:129-134): batch_size is the GLOBAL
        # batch; every process computes the same seeded global order, then
        # fetches only its disjoint contiguous slice of each batch.
        if batch_size % max(process_count, 1):
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {process_count}")
        self.process_index = process_index
        self.process_count = max(process_count, 1)
        if num_workers is None:
            num_workers = min(8, os.cpu_count() or 1)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, i: int, epoch: int):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, int(i)])
        )
        ds = self.dataset
        return ds.get(int(i), rng=rng) if hasattr(ds, "get") else ds[int(i)]

    @staticmethod
    def _stack(examples):
        return {k: np.stack([e[k] for e in examples]) for k in examples[0]}

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        end = len(order) - (len(order) % bs if self.drop_last else 0)
        batches = [order[s : s + bs] for s in range(0, end, bs)]
        if self.process_count > 1:
            loc = bs // self.process_count
            lo = self.process_index * loc
            # A short trailing batch cannot split evenly across processes
            # (mismatched global shapes); drop it regardless of drop_last.
            batches = [idx[lo : lo + loc] for idx in batches
                       if len(idx) == bs]

        if self.num_workers == 0:
            for idx in batches:
                yield self._stack([self._fetch(i, epoch) for i in idx])
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque()
            it = iter(batches)

            def submit(idx):
                return [pool.submit(self._fetch, i, epoch) for i in idx]

            for _ in range(self.prefetch + 1):
                nxt = next(it, None)
                if nxt is None:
                    break
                pending.append(submit(nxt))
            while pending:
                futs = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(submit(nxt))
                yield self._stack([f.result() for f in futs])
