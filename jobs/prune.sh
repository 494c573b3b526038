#!/usr/bin/env bash
# APTP pruning stage (SD / SDXL / Flux — dispatch on the config's model
# type). The reference ships no pruning job; this mirrors its training-job
# argument contract (slurm_scripts/coco/*.slurm).
# Usage: jobs/prune.sh CONFIG_PATH COCO_DIR MODEL_DIR MPNET_DIR [RUN_NAME]
set -euo pipefail
CONFIG=${1:?config yaml}; COCO=${2:?coco dir}; MODEL=${3:?model dir}
MPNET=${4:?mpnet dir}; RUN_NAME=${5:-aptp-prune}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
exec python scripts/aptp/prune.py \
  --base_config_path "$CONFIG" \
  --pretrained_model_name_or_path "$MODEL" \
  --mpnet_model "$MPNET" \
  --wandb_run_name "$RUN_NAME"
