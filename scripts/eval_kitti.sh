#!/usr/bin/env bash
# usage: scripts/eval_kitti.sh <scene_dir> [--ckpt_path ...]
SCENES=$1; shift
python -m point_sam_tpu.evalsuite.eval_interactive --config large --scene_dir "$SCENES" "$@"
