#!/usr/bin/env bash
# Nudity unlearning benchmark — parity with the reference's eval_nudity.sh
# method switchboard (baselines/concept_prune/eval_nudity.sh:20-22): the
# method selects which erasure overlay (if any) rides on the expert ckpt.
#   method=aptp            -> bilevel-finetuned checkpoint as-is
#   method=esd|uce|...     -> pass the method's overlay via OVERLAY=path.npz
# Usage: [OVERLAY=esd.npz] [PROMPTS=i2p|mma|file.csv] \
#        jobs/nudity_eval.sh CKPT_DIR SD_DIR OUT_DIR
set -euo pipefail
CKPT=${1:?checkpoint dir}; SD_DIR=${2:?sd dir}; OUT=${3:?out dir}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
mkdir -p "$OUT"
python scripts/metrics/nudity_eval.py \
  --checkpoint_dir "$CKPT" --pretrained_root "$SD_DIR" \
  --prompts "${PROMPTS:-i2p}" \
  ${OVERLAY:+--erasure_ckpt_path "$OVERLAY"} \
  --save_dir "$OUT/images" --out "$OUT/nudity_results.json"
