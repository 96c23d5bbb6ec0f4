#!/usr/bin/env bash
# Oracle trajectory generation (reference:
# scripts/streamvln_trajectory_generation.sh).
set -euo pipefail
python -m streamvln_tpu.trajectory_generation \
    --output_path "${OUTPUT_PATH:?}" \
    --rank "${RANK:-0}" --world_size "${WORLD_SIZE:-1}" "$@"
