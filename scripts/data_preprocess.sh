#!/usr/bin/env bash
# WOMD tfrecord extraction (reference scripts/data_preprocess.sh); restart on
# failure like the reference watchdog loop (data_preprocess_loop.sh) --
# extraction is idempotent, finished scenarios are skipped.
set -uo pipefail
INPUT_DIR=${INPUT_DIR:?set INPUT_DIR to the tfrecord dir}
OUTPUT_DIR=${OUTPUT_DIR:?set OUTPUT_DIR}
for i in $(seq 1 "${MAX_RESTARTS:-5}"); do
    python -m infgen_tpu.data.preprocess --input_dir "$INPUT_DIR" \
        --output_dir "$OUTPUT_DIR" "$@" && exit 0
    echo "preprocess attempt $i failed; restarting" >&2
done
exit 1
