#!/usr/bin/env bash
# Training launch (reference scripts/run_train.sh equivalent).
# Data-parallel over all local TPU devices.
set -euo pipefail
CONFIG=${CONFIG:-configs/ours_long_term.yaml}
DATA_DIR=${DATA_DIR:-data/waymo_processed/training}
SAVE_DIR=${SAVE_DIR:-runs/$(basename "$CONFIG" .yaml)}
python -m infgen_tpu.cli train --config "$CONFIG" --data_dir "$DATA_DIR" \
    --save_dir "$SAVE_DIR" "$@"
