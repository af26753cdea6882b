#!/bin/bash
# Sampling launcher — same dataset arguments as the reference's sample.sh.
# usage: sh sample.sh {mnist|clevr|coco-stackgan-2|coco-attngan} [extra args...]
set -e
DATASET="$1"; shift || true
# reference-compatible GPU-ids positional (sh train.sh mnist 0,1) — mapped
# to --gpu (a no-op on TPU; the mesh uses all attached devices)
case "${1:-}" in
  ""|*[!0-9,]*) GPU="" ;;
  *) GPU="--gpu $1"; shift ;;
esac
case "$DATASET" in
  mnist)
    python -m multiple_objects_gan_tpu.cli.main --variant multi-mnist $GPU --cfg cfg/mnist_eval.yml "$@" ;;
  clevr)
    python -m multiple_objects_gan_tpu.cli.main --variant clevr $GPU --cfg cfg/clevr_eval.yml "$@" ;;
  coco-stackgan-2)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-2 $GPU --cfg cfg/coco_s2_eval.yml "$@" ;;
  coco-attngan)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-attngan $GPU --cfg cfg/coco_attn_eval.yml "$@" ;;
  *)
    echo "usage: sh sample.sh {mnist|clevr|coco-stackgan-2|coco-attngan} [extra args]"; exit 1 ;;
esac
