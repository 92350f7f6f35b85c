"""Seeding helpers.

The reference derives 128-bit per-worker seeds for torch dataloader workers
(pc_sam/utils/torch_utils.py:8-25). Our data pipeline is single-process
numpy + jax PRNG keys, so seeding is simpler: one call pins python/numpy
global RNGs and returns a root jax key; per-stream keys are split from it.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    """Seed python + numpy global RNGs; return a root jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    import jax

    return jax.random.PRNGKey(seed)


def worker_rng(seed: int, worker_id: int) -> np.random.Generator:
    """Independent numpy Generator per logical worker/stream, derived via
    SeedSequence spawning (the principled version of the reference's
    128-bit seed derivation)."""
    ss = np.random.SeedSequence([seed, worker_id])
    return np.random.default_rng(ss)
