#!/usr/bin/env bash
# Real-world HTTP agent server (reference: streamvln/http_realworld_server.py).
set -euo pipefail
python -m streamvln_tpu.serve.http_server \
    --model_path "${MODEL_PATH:-}" --port "${PORT:-5801}" "$@"
