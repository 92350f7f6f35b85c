#!/usr/bin/env bash
python -m point_sam_tpu.train.trainer --config voronoi_giant "$@"
