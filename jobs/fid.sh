#!/usr/bin/env bash
# FID of a generated-image dir vs COCO-val (reference slurm_scripts/evaluation/fid.slurm).
set -euo pipefail
GEN_DIR=${1:?generated .npy dir}; REF=${2:-}
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
if [ -n "$REF" ]; then
  exec python scripts/metrics/fid.py --gen_dir "$GEN_DIR" --ref_dir "$REF"
fi
exec python scripts/metrics/fid.py --gen_dir "$GEN_DIR"
