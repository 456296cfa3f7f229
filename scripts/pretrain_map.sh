#!/usr/bin/env bash
# Map-only pretraining launch (reference scripts/pretrain_map.sh — its Slurm
# 4-GPU job becomes a data-parallel mesh over all local TPU devices).
set -euo pipefail
CONFIG=${CONFIG:-configs/pretrain_scalable_map.yaml}
DATA_DIR=${DATA_DIR:-data/waymo_processed/training}
SAVE_DIR=${SAVE_DIR:-runs/pretrain_map}
python -m infgen_tpu.cli train --config "$CONFIG" --data_dir "$DATA_DIR" \
    --save_dir "$SAVE_DIR" "$@"
