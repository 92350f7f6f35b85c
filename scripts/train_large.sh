#!/usr/bin/env bash
# ViT-L training run (reference scripts/train_large.sh launched
# `accelerate launch --mixed_precision=bf16 train.py --config large`;
# here bf16 + data-parallel sharding are native to the jitted step).
python -m point_sam_tpu.train.trainer --config large "$@"
