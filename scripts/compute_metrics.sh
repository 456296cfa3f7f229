#!/usr/bin/env bash
# Offline WOSAC metric flow (reference scripts/compute_metrics.sh).
set -euo pipefail
CONFIG=${CONFIG:-configs/ours_long_term.yaml}
DATA_DIR=${DATA_DIR:-data/waymo_processed/validation}
LOG_DIR=${LOG_DIR:-runs/log_features}
ROLLOUT_DIR=${ROLLOUT_DIR:-runs/eval}
python -m infgen_tpu.metrics.offline --dump_log --aggregate_log --compute_metric \
    --config "$CONFIG" --data_dir "$DATA_DIR" --log_dir "$LOG_DIR" \
    --rollout_dir "$ROLLOUT_DIR" "$@"
