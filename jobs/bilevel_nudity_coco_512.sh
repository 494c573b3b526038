#!/usr/bin/env bash
# Nudity-suppression bilevel fine-tune (reference
# slurm_scripts/coco/baseline_coco_aptp_both_512_bilevel_nudity.slurm).
set -euo pipefail
COCO_DIR=${1:?coco dir}; SD_DIR=${2:?sd-2.1 dir}; PRUNE_CKPT=${3:?pruning ckpt}; EXPERT=${4:?expert id}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
exec python scripts/aptp/bilevel_finetune_nudity.py \
  --base_config_path configs/baselines/sd-2-1_coco_aptp_both_512_bilevel_nudity.yaml \
  --pretrained_model_name_or_path "$SD_DIR" \
  --pruning_ckpt_dir "$PRUNE_CKPT" --expert_id "$EXPERT" \
  --wandb_run_name "bilevel-nudity-coco-512-expert$EXPERT"
