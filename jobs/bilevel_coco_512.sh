#!/usr/bin/env bash
# Bilevel fine-tune (style removal) on a TPU slice — parity with
# slurm_scripts/coco/baseline_coco_aptp_both_512_bilevel.slurm
set -euo pipefail
COCO_DIR=${1:?coco dir}; SD_DIR=${2:?sd-2.1 dir}; PRUNE_CKPT=${3:?pruning ckpt}; EXPERT=${4:?expert id}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
python scripts/aptp/bilevel_finetune.py \
  --base_config_path configs/baselines/sd-2-1_coco_aptp_both_512_bilevel.yaml \
  --pretrained_model_name_or_path "$SD_DIR" \
  --pruning_ckpt_dir "$PRUNE_CKPT" --expert_id "$EXPERT" \
  --wandb_run_name "bilevel-coco-512-expert$EXPERT"
