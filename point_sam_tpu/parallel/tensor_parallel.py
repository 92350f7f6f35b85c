"""Tensor (model) parallelism for the ViT backbone.

Megatron-style sharding of the transformer's weight matrices over a
``model`` mesh axis, expressed purely as GSPMD sharding annotations — XLA
inserts the per-layer collectives (an all-reduce of the row-parallel
matmul partials) over ICI. The reference has no model parallelism at all
(its only mode is DDP, train.py:163-176); this is what lets the EVA-giant
backbone (~1B params) serve with tokens*hidden activations and weights
split across chips.

Layout (per EVA block, models/vit.py):
  - q/k/v projections (or fused qkv): COLUMN-parallel — output features =
    heads x head_dim sharded, so attention heads land whole on shards and
    the attention kernel runs per-shard with no communication.
  - attention output projection: ROW-parallel — contracts the sharded
    feature axis; GSPMD all-reduces the partial sums.
  - SwiGLU fc1_g / fc1_x (or GeLU fc1): COLUMN-parallel over the hidden
    dim; fc2: ROW-parallel. The EVA02 sub-LN over the sharded hidden axis
    keeps full-axis statistics — GSPMD inserts the mean/var all-reduce.
  - LayerNorms over the (replicated) embed axis, and every non-ViT module
    (patch encoder, prompt encoders, decoder — ~5% of params): replicated.

Works with both ViT param layouts: the scan-over-blocks stacked form
(kernels [depth, in, out]) and the unrolled form (kernels [in, out]) — the
rules match on path suffixes and shard the LAST (column) or SECOND-TO-LAST
(row) axis. A dim not divisible by the mesh's model-axis size falls back
to replicated for that leaf.

Usage:
    mesh = make_mesh_2d(n_data, n_model)
    variables = tp_place(variables, mesh)     # or tp_sharding_tree(...)
    jit(encode)(variables, ...)               # GSPMD does the rest
    make_train_step(..., param_sharding="tp", state_example=state)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path-suffix, mode): mode "col" shards the last axis, "row" the
# second-to-last, "vec" the last axis of a vector leaf. First match wins.
_TP_RULES: tuple[tuple[str, str], ...] = (
    ("attn/q_proj/kernel", "col"),
    ("attn/k_proj/kernel", "col"),
    ("attn/v_proj/kernel", "col"),
    ("attn/qkv/kernel", "col"),
    ("attn/q_proj/bias", "vec"),
    ("attn/v_proj/bias", "vec"),
    ("attn/qkv/bias", "vec"),
    ("attn/proj/kernel", "row"),
    ("mlp/fc1_g/kernel", "col"),
    ("mlp/fc1_x/kernel", "col"),
    ("mlp/fc1/kernel", "col"),
    ("mlp/fc1_g/bias", "vec"),
    ("mlp/fc1_x/bias", "vec"),
    ("mlp/fc1/bias", "vec"),
    # EVA02 sub-LN parameters live on the sharded hidden axis.
    ("mlp/norm/LayerNorm_0/scale", "vec"),
    ("mlp/norm/LayerNorm_0/bias", "vec"),
    ("mlp/fc2/kernel", "row"),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path: str, shape, n_model: int) -> P:
    # Scope to the ViT backbone (pc_encoder/transformer/...): the mask
    # decoder's little two-way transformer shares sub-path names (mlp/fc1)
    # but is ~1% of params — sharding it buys nothing and costs collectives.
    if "pc_encoder/transformer/" not in path:
        return P()
    for suffix, mode in _TP_RULES:
        if path.endswith(suffix):
            if mode == "col" or mode == "vec":
                axis = len(shape) - 1
            else:  # row
                axis = len(shape) - 2
            if axis < 0 or shape[axis] % n_model:
                return P()
            spec = [None] * len(shape)
            spec[axis] = MODEL_AXIS
            return P(*spec)
    return P()


def tp_spec_tree(tree, n_model: int):
    """PartitionSpec pytree for a params/variables tree (pure specs — used
    by tests and by state-sharding composition)."""

    def one(path, leaf):
        return _spec_for(_path_str(path), getattr(leaf, "shape", ()), n_model)

    return jax.tree_util.tree_map_with_path(one, tree)


def tp_sharding_tree(tree, mesh: Mesh):
    """NamedSharding pytree: ViT matrices sharded over the model axis per
    the Megatron layout above, everything else replicated."""
    n_model = int(mesh.shape[MODEL_AXIS])

    def one(path, leaf):
        return NamedSharding(
            mesh, _spec_for(_path_str(path), getattr(leaf, "shape", ()),
                            n_model)
        )

    return jax.tree_util.tree_map_with_path(one, tree)


def tp_place(tree, mesh: Mesh):
    """device_put a variables/params pytree with TP shardings."""
    sh = tp_sharding_tree(tree, mesh)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
