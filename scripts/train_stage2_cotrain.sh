#!/usr/bin/env bash
# Stage-2 co-training with VideoQA/ScanQA/MMC4 mixture
# (reference: config/co-training_data.yaml + streamvln_train_slurm.sh).
set -euo pipefail
python -m streamvln_tpu.train \
    --video_folders "${VIDEO_FOLDERS:?}" \
    --cotrain_yaml "${COTRAIN_YAML:?}" \
    --media_root_qa "${MEDIA_ROOT_QA:-}" \
    --media_root_scanqa "${MEDIA_ROOT_SCANQA:-}" \
    --media_root_mmc4 "${MEDIA_ROOT_MMC4:-}" \
    --output_dir "${OUTPUT_DIR:-runs/stage2}" \
    --model_size 7b --group_by_task \
    --learning_rate 2e-5 --mm_vision_tower_lr 5e-6 \
    --batch_size "${BATCH_SIZE:-16}" --num_steps "${NUM_STEPS:-2000}" \
    --export_hf "$@"
