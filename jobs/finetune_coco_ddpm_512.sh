#!/usr/bin/env bash
CONFIG=sd-2-1_coco_aptp_ddpm_512.yaml RUN_NAME=aptp-coco-ddpm-512 \
  exec bash "$(dirname "$0")/_finetune_common.sh" "$@"
