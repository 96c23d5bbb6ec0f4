#!/usr/bin/env bash
# DAgger data collection (reference: scripts/streamvln_dagger_collect.sh).
set -euo pipefail
python -m streamvln_tpu.dagger \
    --model_path "${MODEL_PATH:-}" \
    --output_path "${OUTPUT_PATH:?}" \
    --dagger_p "${DAGGER_P:-0.75}" --dagger_data_it "${DAGGER_IT:-0}" \
    --rank "${RANK:-0}" --world_size "${WORLD_SIZE:-1}" "$@"
