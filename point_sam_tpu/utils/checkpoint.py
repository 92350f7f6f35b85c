"""Checkpoint loading helpers for eval/serving entry points.

Accepts either an orbax checkpoint directory produced by the trainer
(train/trainer.py saves a TrainState) or a torch ``.safetensors`` file in
the reference's released-checkpoint format (converted via utils.convert;
reference loads these with safetensors.torch.load_model,
eval_kitti.py:319).
"""

from __future__ import annotations

from pathlib import Path

import re


def adapt_block_layout(restored: dict, target: dict) -> dict:
    """Bridge the ViT param layouts across the scan_blocks change.

    models/vit.py ViTConfig.scan_blocks (default True since round 2)
    stores the block stack as ONE [depth, ...] leaf at ".../blocks/block/
    ..."; earlier checkpoints (scan_blocks=False era) hold per-block
    subtrees ".../blocks_i/...". Restoring one layout into a model built
    with the other silently loses the encoder. This adapter stacks
    blocks_i leaves into the scan layout (or slices the stacked leaf back
    out) so either generation of orbax checkpoint restores into either
    model; no-op when layouts already agree.
    """
    import numpy as np

    def _flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(_flat(v, p))
            else:
                out[p] = v
        return out

    src, tgt = _flat(restored), _flat(target)
    if set(src) == set(tgt):
        return restored
    unroll_re = re.compile(r"(.*)/blocks_(\d+)/(.*)")
    out: dict[str, object] = {}
    pending: dict[str, dict[int, object]] = {}
    for path, leaf in src.items():
        m = unroll_re.match(path)
        stacked = m and f"{m.group(1)}/blocks/block/{m.group(3)}" in tgt
        if stacked:
            pending.setdefault(
                f"{m.group(1)}/blocks/block/{m.group(3)}", {}
            )[int(m.group(2))] = leaf
        elif "/blocks/block/" in path and path not in tgt:
            pre, post = path.split("/blocks/block/", 1)
            for i in range(np.shape(leaf)[0]):
                up = f"{pre}/blocks_{i}/{post}"
                if up in tgt:
                    out[up] = np.asarray(leaf)[i]
        else:
            out[path] = leaf
    for path, by_idx in pending.items():
        out[path] = np.stack([by_idx[i] for i in sorted(by_idx)])

    nested: dict = {}
    for path, leaf in out.items():
        node = nested
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return nested


def load_variables(path: str, variables: dict) -> dict:
    """Load weights from ``path`` into (a copy of) ``variables``."""
    p = Path(path)
    if p.is_file() and p.suffix == ".safetensors":
        from .convert import load_torch_safetensors

        new_vars, report = load_torch_safetensors(str(p), variables,
                                                  strict=False)
        if report["unmapped"]:
            print(f"warning: {len(report['unmapped'])} unmapped torch keys "
                  f"(first: {report['unmapped'][:3]})")
        if report["unfilled"]:
            print(f"warning: {len(report['unfilled'])} unfilled params "
                  f"(first: {report['unfilled'][:3]})")
        return new_vars
    if p.is_dir():
        import jax
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(p.absolute())
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {p}")
        restored = mgr.restore(step)
        # TrainState layout: {step, params, buffers, opt_state}.
        if "params" in restored:
            out = dict(params=restored["params"])
            out.update(restored.get("buffers") or {})
        else:
            out = restored
        return adapt_block_layout(out, variables)
    raise FileNotFoundError(path)
