#!/usr/bin/env bash
# Artist-style erasure benchmark (reference eval_artish.sh +
# baselines/concept_prune/artist_erasure.py): generate the per-artist prompt
# CSV with the (optionally erasure-overlaid) expert, then score style
# similarity with a local CLIP dir.
# Usage: [OVERLAY=esd.npz] [CLIP_MODEL=path] \
#        jobs/artist_eval.sh CKPT_DIR SD_DIR PROMPTS_CSV ARTIST OUT_DIR
set -euo pipefail
CKPT=${1:?checkpoint dir}; SD_DIR=${2:?sd dir}; CSV=${3:?prompts csv}
ARTIST=${4:?artist name}; OUT=${5:?out dir}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
mkdir -p "$OUT"
python scripts/metrics/artist_erasure.py \
  --checkpoint_dir "$CKPT" --pretrained_root "$SD_DIR" \
  --prompts_csv "$CSV" --artist "$ARTIST" \
  ${OVERLAY:+--erasure_ckpt_path "$OVERLAY"} \
  ${CLIP_MODEL:+--clip_model "$CLIP_MODEL"} \
  --save_dir "$OUT/images" --out "$OUT/artist_results.json"
