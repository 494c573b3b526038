#!/usr/bin/env bash
# CLIP score of generated images vs their captions (reference
# slurm_scripts/evaluation/clip_score.sh: features then score).
set -euo pipefail
GEN_DIR=${1:?generated image dir}; CAPTIONS_DIR=${2:?captions .txt dir}; OUT=${3:-clip_features}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
python scripts/metrics/clip_features.py --captions_dir "$CAPTIONS_DIR" --save_dir "$OUT"
exec python scripts/metrics/clip_score.py --image_dir "$GEN_DIR" --text_features_dir "$OUT"
