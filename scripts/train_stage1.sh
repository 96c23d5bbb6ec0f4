#!/usr/bin/env bash
# Stage-1 VLN SFT (reference: scripts/streamvln_train_slurm.sh).
# Multi-host: launch once per host with COORDINATOR_ADDRESS set; JAX
# wires the mesh over ICI/DCN (replaces torchrun c10d rendezvous).
set -euo pipefail
python -m streamvln_tpu.train \
    --video_folders "${VIDEO_FOLDERS:?set VIDEO_FOLDERS}" \
    --output_dir "${OUTPUT_DIR:-runs/stage1}" \
    --model_size 7b \
    --model_path "${MODEL_PATH:-}" \
    --num_frames 32 --num_future_steps 4 --num_history 8 \
    --learning_rate 2e-5 --mm_vision_tower_lr 5e-6 \
    --model_max_length 32768 \
    --batch_size "${BATCH_SIZE:-16}" \
    --num_steps "${NUM_STEPS:-2000}" \
    --dp "${DP:-1}" --tp "${TP:-1}" \
    --data_augmentation --export_hf "$@"
