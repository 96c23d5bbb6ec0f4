#!/usr/bin/env bash
# Distributed R2R val-unseen eval (reference:
# scripts/streamvln_eval_multi_gpu.sh: torchrun x8, episodes
# rank-sharded). Here: one process per host/chip, RANK/WORLD_SIZE env.
set -euo pipefail
python -m streamvln_tpu.eval_cli \
    --model_path "${MODEL_PATH:?}" \
    --env_backend habitat \
    --habitat_config_path "${HABITAT_CONFIG:-config/vln_r2r.yaml}" \
    --eval_split val_unseen \
    --output_path "${OUTPUT_PATH:-results/val_unseen/streamvln}" \
    --num_future_steps 4 --num_frames 32 --num_history 8 \
    --rank "${RANK:-0}" --world_size "${WORLD_SIZE:-1}" "$@"
