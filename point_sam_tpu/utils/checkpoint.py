"""Checkpoint loading helpers for eval/serving entry points.

Accepts either an orbax checkpoint directory produced by the trainer
(train/trainer.py saves a TrainState) or a torch ``.safetensors`` file in
the reference's released-checkpoint format (converted via utils.convert;
reference loads these with safetensors.torch.load_model,
eval_kitti.py:319).
"""

from __future__ import annotations

from pathlib import Path


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
            return out
        return restored
    raise FileNotFoundError(path)
