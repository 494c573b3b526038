#!/usr/bin/env bash
# FID image generation — parity with slurm_scripts/evaluation/gen_images.slurm
set -euo pipefail
CKPT=${1:?checkpoint dir}; SD_DIR=${2:?sd dir}; COCO=${3:?coco dir}; OUT=${4:?out dir}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
python scripts/metrics/generate_fid_images.py \
  --checkpoint_dir "$CKPT" --pretrained_root "$SD_DIR" \
  --coco_data_dir "$COCO" --save_dir "$OUT"
