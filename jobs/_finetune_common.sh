#!/usr/bin/env bash
# Shared launcher body for the expert fine-tuning recipes (reference
# slurm_scripts/coco/baseline_coco_aptp_*.slurm argument contract).
set -euo pipefail
CONFIG=${CONFIG:?set CONFIG before sourcing}
RUN_NAME=${RUN_NAME:?set RUN_NAME before sourcing}
COCO_DIR=${1:?coco dir}; SD_DIR=${2:?sd-2.1 dir}; PRUNE_CKPT=${3:?pruning ckpt}; EXPERT=${4:?expert id}
cd "$(dirname "$0")/.."
# persistent XLA compile cache: warm reruns skip the multi-minute 512px
# compiles (point at a shared path on clusters)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
exec python scripts/aptp/finetune.py \
  --base_config_path "configs/baselines/${CONFIG}" \
  --pretrained_model_name_or_path "$SD_DIR" \
  --pruning_ckpt_dir "$PRUNE_CKPT" --expert_id "$EXPERT" \
  --wandb_run_name "${RUN_NAME}-expert${EXPERT}"
