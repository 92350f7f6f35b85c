"""point_sam_tpu: a TPU-native (JAX/XLA/Pallas) promptable 3D segmentation framework.

A from-scratch rebuild of the capabilities of Point-SAM ("SAM for point clouds",
arXiv 2406.17741; reference implementation zyc00/Point-SAM) designed TPU-first:

- Fixed-shape, padding-aware geometry kernels (FPS / kNN / grouping / 3-NN
  interpolation) instead of the reference's CUDA torkit3d ops
  (cf. reference pc_sam/model/common.py).
- A functional Flax model stack (point-patch ViT encoder, prompt encoders,
  SAM-style two-way decoder) compiled by XLA, with Pallas kernels on the hot
  paths (cf. reference pc_sam/model/*.py).
- A device-side, batched click simulator replacing the reference's host-side
  Python prompt sampling loops (cf. reference pc_sam/model/common.py:287-474).
- pjit/shard_map data parallelism over a jax.sharding.Mesh instead of
  NCCL DDP via HF Accelerate (cf. reference train.py:163-176).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

__all__ = ["ops", "__version__"]
