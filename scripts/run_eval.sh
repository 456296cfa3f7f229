#!/usr/bin/env bash
# Closed-loop evaluation with rollout dumps (reference scripts/run_eval.sh).
set -euo pipefail
CONFIG=${CONFIG:-configs/ours_long_term.yaml}
DATA_DIR=${DATA_DIR:-data/waymo_processed/validation}
SAVE_DIR=${SAVE_DIR:-runs/eval}
CKPT=${CKPT:-}
ARGS=(--config "$CONFIG" --data_dir "$DATA_DIR" --save_dir "$SAVE_DIR" --dump_rollouts)
[ -n "$CKPT" ] && ARGS+=(--ckpt_path "$CKPT")
python -m infgen_tpu.cli rollout "${ARGS[@]}" "$@"
