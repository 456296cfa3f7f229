#!/usr/bin/env bash
# Watchdog-restart preprocessing loop (reference scripts/data_preprocess_loop.sh:
# restarts on crashes/memory leaks until the output is complete; our jobs are
# idempotent, existing pkls are skipped).
set -uo pipefail
INPUT_DIR=${INPUT_DIR:-data/waymo/training}
OUTPUT_DIR=${OUTPUT_DIR:-data/waymo_processed/training}
while true; do
  python -m infgen_tpu.data.preprocess \
      --input_dir "$INPUT_DIR" --output_dir "$OUTPUT_DIR" "$@" && break
  echo "preprocess exited nonzero; restarting in 5s" >&2
  sleep 5
done
