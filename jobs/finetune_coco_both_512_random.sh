#!/usr/bin/env bash
CONFIG=sd-2-1_coco_aptp_both_512_random.yaml RUN_NAME=aptp-coco-both-512-random \
  exec bash "$(dirname "$0")/_finetune_common.sh" "$@"
