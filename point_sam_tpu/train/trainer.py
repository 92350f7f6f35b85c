"""Training entry point: config -> model -> data -> mesh-sharded train loop.

Equivalent of the reference's ``train.py`` (386 LoC torch/Accelerate trainer,
SURVEY.md §3.1), redesigned for TPU:

- the whole step (click-simulation forward, loss, backward, clip, AdamW,
  schedule) is one jitted XLA program over a data mesh (parallel.train_step);
- checkpoint/resume via orbax (replaces accelerate save_state/load_state,
  reference train.py:244-252,341-343) with keep-1 rotation matching
  ``total_limit=1`` (reference train.py:163-165);
- metrics mirror the reference's wandb scalar surface (train.py:284-304):
  total loss + per-iteration {acc, fg_acc, bg_acc, iou, loss_mask, loss_iou}
  for the first and last click iterations; wandb is optional and gated;
- validation computes IoU-per-click and best-of-multimask IoU on the val
  split (reference train.py:197-235).

CLI: ``python -m point_sam_tpu.train.trainer --config large [k=v ...]``
(hydra-style dotted overrides, reference train.py:65).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("overrides", nargs="*", default=[])
    args = parser.parse_args(argv)

    import jax

    if os.environ.get("PSAM_CPU") == "1":
        # Debug/smoke path: the axon sitecustomize overrides JAX_PLATFORMS,
        # so force the CPU backend via config (CLAUDE.md gotchas; same hook
        # as bench.py's BENCH_CPU).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..datasets.build import BatchIterator, build_dataset
    from ..parallel import (
        TrainState,
        make_mesh,
        make_optimizer,
        make_train_step,
        replicate,
        shard_batch,
    )
    from ..utils.config import build_model, load_config
    from .schedule import warmup_multistep

    cfg = load_config(args.config, args.overrides)
    seed = cfg.get("seed", 42)

    # -------------------------------------------------- multi-host init
    # Replaces Accelerate's rank handling (reference train.py:163-176,
    # launched per-GPU by accelerate launch): join the process group
    # BEFORE first backend use so jax.devices() is the global list and
    # make_mesh() below builds a global mesh.
    from ..parallel.distributed import is_main_process, maybe_initialize

    maybe_initialize(cfg)
    n_proc = jax.process_count()
    main_proc = is_main_process()

    # ------------------------------------------------------------- model
    model = build_model(cfg.model)
    if main_proc:
        print(f"model: {type(model).__name__} ({cfg.model.get('vit')})"
              + (f" [{n_proc} processes]" if n_proc > 1 else ""))

    # -------------------------------------------------------------- data
    ctx = {"num_samples": cfg.get("num_samples")}
    train_ds = build_dataset(cfg.train_dataset, seed=seed, context=ctx)
    train_iter = BatchIterator(
        train_ds,
        cfg.train_dataloader.batch_size,
        shuffle=cfg.train_dataloader.get("shuffle", True),
        drop_last=cfg.train_dataloader.get("drop_last", True),
        seed=seed,
        process_index=jax.process_index(),
        process_count=n_proc,
    )
    val_iter = None
    if cfg.get("val_freq", 0) > 0:
        val_ds = build_dataset(cfg.val_dataset, seed=seed + 1, context=ctx)
        val_iter = BatchIterator(
            val_ds, cfg.val_dataloader.batch_size, shuffle=False,
            drop_last=False, seed=seed,
        )

    # --------------------------------------------- optimizer + schedule
    sched = warmup_multistep(
        cfg.lr,
        cfg.scheduler.milestones,
        gamma=cfg.scheduler.get("gamma", 0.1),
        warmup_factor=cfg.scheduler.get("warmup_factor", 0.001),
        warmup_iters=cfg.scheduler.get("warmup_iters", 1000),
    )
    tx = make_optimizer(
        sched,
        weight_decay=cfg.get("weight_decay", 0.1),
        max_grad_value=cfg.get("max_grad_value", 1.0),
    )

    # ------------------------------------------------------------- init
    mesh = make_mesh()
    accum = cfg.get("gradient_accumulation_steps", 1)
    # param_sharding: "replicated" (DDP-equivalent) or "fsdp" (ZeRO-3-style
    # param+optimizer sharding; needed for EVA-giant-scale training).
    param_sharding = cfg.get("param_sharding", "replicated")
    ckpt_path = cfg.get("pretrained_ckpt_path")

    first = next(iter(train_iter))
    init_batch = {k: jnp.asarray(v) for k, v in first.items()}

    def init_fn(k0, k1, b):
        return model.init(
            {"params": k0, "sampler": k1},
            b["coords"], b["features"], b["gt_masks"],
        )

    init_args = (jax.random.PRNGKey(seed), jax.random.PRNGKey(seed + 1),
                 init_batch)

    if param_sharding == "fsdp":
        # Sharded from birth: no device ever holds the full fp32 params +
        # AdamW moments (the whole point of FSDP at giant scale).
        # Pretrained weights stream in per-leaf afterwards
        # (_fsdp_load_pretrained) — still never a full replica.
        from ..parallel import fsdp_init_state

        with mesh:
            state = fsdp_init_state(init_fn, init_args, tx, mesh)
        if ckpt_path:
            state = _fsdp_load_pretrained(ckpt_path, state, init_fn,
                                          init_args)
            if main_proc:
                print(f"initialized from {ckpt_path} (fsdp streaming)")

        def _state_shape_fn(k0, k1, b):
            v = init_fn(k0, k1, b)
            p = v["params"]
            buf = {k: x for k, x in v.items() if k != "params"}
            return TrainState.create(p, buf, tx)

        # Shapes-only TrainState for deriving the step's shardings.
        state_host = jax.eval_shape(_state_shape_fn, *init_args)
        params_for_count = state.params
    else:
        variables = jax.jit(init_fn)(*init_args)
        params = variables["params"]
        buffers = {k: v for k, v in variables.items() if k != "params"}
        # Pretrained initialization (reference train.py:101-121): Uni3D
        # encoder weights (torch .pt with the documented key surgery) or a
        # full converted checkpoint (.safetensors); conversion on host
        # numpy. Fine for replicated (ViT-L-scale) training — the FSDP
        # branch above streams instead.
        if ckpt_path:
            host_vars = jax.device_get({"params": params, **buffers})
            host_vars, _ = _load_pretrained(ckpt_path, host_vars)
            params = host_vars["params"]
            buffers = {k: v for k, v in host_vars.items() if k != "params"}
            if main_proc:
                print(f"initialized from {ckpt_path}")
        state = TrainState.create(params, buffers, tx)
        state_host = state
        state = replicate(state, mesh)
        params_for_count = state.params
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(params_for_count)
    )
    if main_proc:
        print(f"params: {n_params/1e6:.1f}M")
    from functools import partial as _partial

    from ..models import criterion as criterion_fn

    loss_cfg = cfg.get("loss", {}) or {}
    step_fn = make_train_step(
        model, tx, mesh, accum_steps=accum,
        param_sharding=param_sharding, state_example=state_host,
        criterion=_partial(
            criterion_fn, use_soft_iou=loss_cfg.get("use_soft_iou", False)
        ),
    )

    # ----------------------------------------------------- checkpointing
    project_dir = Path(cfg.get("project_dir", "./logs/run"))
    ckpt_dir = (project_dir / "checkpoints").absolute()
    import orbax.checkpoint as ocp

    ckpt_mgr = ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
    )
    start_epoch, global_step = 0, 0
    latest = ckpt_mgr.latest_step()
    if latest is not None:
        # Abstract template with the LIVE state's shardings: orbax restores
        # each leaf directly to its sharded global placement (each process
        # reads only its shards). A jax.device_get(state) template would
        # crash on multi-host FSDP (non-addressable shards) and stage the
        # full state on host.
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), state)
        state = ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(template)
        )
        global_step = int(jax.device_get(state.step))
        start_epoch = latest
        if main_proc:
            print(f"resumed from epoch {latest} (global step {global_step})")

    # ------------------------------------------------------------ logging
    # wandb/stdout only on process 0 (Accelerate is_main_process
    # equivalent); orbax saves run on ALL processes (multihost-collective).
    wandb_run = None
    if main_proc and cfg.get("log_with") == "wandb":
        try:
            import wandb

            wandb_run = wandb.init(
                project=cfg.get("project_name", "point-sam-tpu"),
                name=cfg.get("run_name"), config=json.loads(json.dumps(cfg)),
            )
        except Exception as e:  # offline environments
            print(f"wandb unavailable ({e}); logging to stdout")

    def log(metrics: dict, step: int):
        if not main_proc:
            return
        if wandb_run is not None:
            wandb_run.log(metrics, step=step)
        else:
            line = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
            print(f"[step {step}] {line}", flush=True)

    # ------------------------------------------------------------- train
    max_epochs = cfg.get("max_epochs", 10000)
    max_steps = cfg.get("max_steps", 5_000_000)
    rng = jax.random.PRNGKey(seed + 2)

    for epoch in range(start_epoch, max_epochs):
        t_epoch = time.perf_counter()
        for batch_np in train_iter:
            rng, step_rng = jax.random.split(rng)
            with mesh:
                batch = shard_batch(batch_np, mesh)
                state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            if global_step % cfg.get("log_freq", 20) == 0:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                host["lr"] = float(sched(global_step))
                log({f"train/{k}": v for k, v in host.items()}, global_step)
            if global_step >= max_steps:
                break

        if main_proc:
            print(
                f"epoch {epoch} done in {time.perf_counter()-t_epoch:.1f}s "
                f"(step {global_step})", flush=True,
            )

        if val_iter is not None and (epoch + 1) % cfg.val_freq == 0:
            # Validation data is NOT process-sharded: every process runs the
            # identical (deterministic) loop on its own devices — redundant
            # but dependency-free; only process 0 logs.
            val_metrics = validate(model, state, val_iter, mesh)
            log({f"val/{k}": v for k, v in val_metrics.items()}, global_step)
            # Sample visualization: write predicted-mask PLYs (offline
            # analogue of the reference's wandb.Object3D panels,
            # train.py:314-327).
            vis_freq = cfg.get("vis_freq", 0)
            if main_proc and vis_freq and (epoch + 1) % vis_freq == 0:
                dump_visualizations(
                    model, state, val_iter,
                    Path(cfg.get("project_dir", ".")) / "vis" / f"ep{epoch+1}",
                    wandb_run=wandb_run, step=global_step,
                )

        if (epoch + 1) % cfg.get("save_freq", 5) == 0 or global_step >= max_steps:
            # Save the global jax.Arrays directly: orbax writes each shard
            # from its owning process (device_get would crash on multi-host
            # FSDP's non-addressable shards and stage the full state on
            # host).
            ckpt_mgr.save(epoch + 1, args=ocp.args.StandardSave(state))
            ckpt_mgr.wait_until_finished()

        if global_step >= max_steps:
            break

    if wandb_run is not None:
        wandb_run.finish()
    return state


def _load_pretrained(path: str, variables: dict):
    """Uni3D .pt (torch pickle) or converted .safetensors -> (variables,
    coverage report). ``variables`` may be host numpy (the FSDP streaming
    path passes lazily-committed zeros — see _fsdp_load_pretrained)."""
    if str(path).endswith(".safetensors"):
        from ..utils.convert import load_torch_safetensors

        return load_torch_safetensors(path, variables, strict=False)
    import torch

    from ..utils.convert import convert_uni3d

    sd = torch.load(path, map_location="cpu", weights_only=True)
    module = sd.get("module", sd)
    module = {k: v.numpy() for k, v in module.items()}
    new_vars, report = convert_uni3d({"module": module}, variables)
    n_filled = len(module) - len(report["unmapped"])
    import jax

    if jax.process_index() == 0:
        print(f"uni3d init: mapped {n_filled} tensors "
              f"({len(report['unmapped'])} non-encoder keys ignored)")
    return new_vars, report


def _fsdp_load_pretrained(path: str, state, init_fn, init_args):
    """Stream pretrained weights into an already-sharded TrainState.

    The replicated path (init on one device -> host round trip -> reshard)
    peaks at the FULL fp32 state both in HBM and host RAM — exactly what
    FSDP exists to avoid at EVA-giant scale (VERDICT r2 weak #4). Here:

    - conversion runs on host numpy against a ``np.zeros`` shapes tree:
      calloc pages are lazily committed, so host RSS grows only by the
      leaves the checkpoint actually covers;
    - each covered leaf is ``jax.device_put`` individually with the
      SHARDING OF THE LEAF IT REPLACES (taken from the born-sharded
      state), so no device ever holds more than its shard plus one leaf;
    - uncovered leaves (``report["unfilled"]``) keep their sharded random
      init — matching the replicated path's semantics.
    """
    import jax

    from ..utils.convert import _flatten

    var_shapes = jax.eval_shape(init_fn, *init_args)
    host_zeros = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), var_shapes)
    new_vars, report = _load_pretrained(path, host_zeros)
    unfilled = set(report["unfilled"])

    flat_host = _flatten(new_vars)
    dev_vars = {"params": state.params, **state.buffers}
    flat_dev = _flatten(dev_vars)
    out = {}
    n_streamed = 0
    for key, dev_leaf in flat_dev.items():
        if key in unfilled:
            out[key] = dev_leaf
        else:
            out[key] = jax.device_put(
                np.asarray(flat_host[key], dtype=dev_leaf.dtype),
                dev_leaf.sharding)
            n_streamed += 1
        flat_host.pop(key, None)  # bound host RSS to one copy
    # Rebuild the nested tree purely from the flat paths: convert._unflatten
    # deepcopies a numpy-fied template, which would np.asarray every sharded
    # DEVICE leaf — a full-params host staging single-host and a
    # non-addressable-array error multi-host. `out` covers every key of
    # `flat_dev`, so no template is needed.
    new_tree = {}
    for path, leaf in out.items():
        parts = path.split("/")
        cur = new_tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = leaf
    if jax.process_index() == 0:
        print(f"fsdp pretrained init: streamed {n_streamed} leaves "
              f"per-shard, {len(unfilled)} kept random init")
    return state.replace(
        params=new_tree["params"],
        buffers={k: v for k, v in new_tree.items() if k != "params"},
    )


def dump_visualizations(model, state, val_iter, out_dir: Path,
                        max_samples: int = 4, wandb_run=None, step=None):
    """Write prompt + best-mask PLYs for a few validation samples; when a
    wandb run is live, additionally log the same clouds as
    ``wandb.Object3D`` panels with prompts recolored (reference
    train.py:314-327,360-382). The PLY dump is the offline fallback and is
    always written."""
    import jax
    import jax.numpy as jnp

    from ..utils import ply

    out_dir.mkdir(parents=True, exist_ok=True)
    variables = {"params": state.params, **state.buffers}
    batch = next(iter(val_iter))
    coords = jnp.asarray(batch["coords"])
    feats = jnp.asarray(batch["features"])
    gt = jnp.asarray(batch["gt_masks"])
    outputs = model.apply(variables, coords, feats, gt, is_eval=True)
    last = jax.device_get(outputs[-1])
    B, M, _ = gt.shape
    xyz = np.asarray(coords)
    panels = {}
    for i in range(min(max_samples, B * M)):
        b = i // M
        rgb = np.clip((np.asarray(feats)[b, :, :3] * 0.5 + 0.5) * 255, 0, 255)
        pred_rgb = ply.mask_colors(xyz[b], last["prompt_masks"][i] > 0, rgb)
        prompt_rgb = ply.prompt_colors(
            xyz[b], last["prompt_coords"][i], last["prompt_labels"][i], rgb
        )
        ply.save_ply(out_dir / f"sample{i}_pred.ply", xyz[b], pred_rgb)
        ply.save_ply(out_dir / f"sample{i}_prompts.ply", xyz[b], prompt_rgb)
        if wandb_run is not None:
            import wandb

            panels[f"val/sample{i}_pred"] = wandb.Object3D(
                np.concatenate([xyz[b], pred_rgb], axis=1)
            )
            panels[f"val/sample{i}_prompts"] = wandb.Object3D(
                np.concatenate([xyz[b], prompt_rgb], axis=1)
            )
    if panels:
        wandb_run.log(panels, step=step)


def validate(model, state, val_iter, mesh):
    """IoU per click + best-of-multimask IoU (reference train.py:197-235)."""
    import jax
    import jax.numpy as jnp

    from ..models import compute_iou

    @jax.jit
    def val_step(variables, coords, features, gt_masks):
        outputs = model.apply(variables, coords, features, gt_masks,
                              is_eval=True)
        B, M, N = gt_masks.shape
        gt_flat = gt_masks.reshape(B * M, N)
        ious, best_multi = [], None
        for i, out in enumerate(outputs):
            if i == 0:
                best = jnp.take_along_axis(
                    out["masks"], out["max_iou_pred_ind"][:, None, None], axis=1
                )[:, 0]
                multi_iou = compute_iou(out["masks"], gt_flat[:, None, :])
                best_multi = jnp.max(multi_iou, axis=1)
            else:
                best = out["masks"][:, 0]
            ious.append(compute_iou(best, gt_flat))
        return jnp.stack(ious), best_multi

    variables = {"params": state.params, **state.buffers}
    if jax.process_count() > 1:
        # Global param arrays cannot mix with the local val batches inside
        # one jit across processes; pull them to host so the val jit is
        # purely process-local. FSDP-sharded leaves are not host-fetchable
        # directly (non-addressable shards) — reshard each leaf to
        # fully-replicated first (an XLA all-gather over the mesh), one
        # leaf at a time so HBM peaks at shard + one full leaf.
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())

        def to_host(x):
            if hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
                x = jax.device_put(x, replicated)
            return jax.device_get(x)

        variables = jax.tree_util.tree_map(to_host, variables)
    agg = defaultdict(list)
    for batch_np in val_iter:
        coords = jnp.asarray(batch_np["coords"])
        feats = jnp.asarray(batch_np["features"])
        gt = jnp.asarray(batch_np["gt_masks"])
        ious, best_multi = jax.device_get(val_step(variables, coords, feats, gt))
        for i in range(len(ious)):
            agg[f"iou({i})"].append(ious[i])
        agg["best_multimask_iou"].append(best_multi)
    return {k: float(np.concatenate(v).mean()) for k, v in agg.items()}


if __name__ == "__main__":
    main()
