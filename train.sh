#!/bin/bash
# Training launcher — same dataset arguments as the reference's train.sh.
# usage: sh train.sh {mnist|clevr|coco-stackgan-1|coco-stackgan-2|coco-attngan} [extra args...]
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
    python -m multiple_objects_gan_tpu.cli.main --variant multi-mnist $GPU --cfg cfg/mnist_train.yml "$@" ;;
  clevr)
    python -m multiple_objects_gan_tpu.cli.main --variant clevr $GPU --cfg cfg/clevr_train.yml "$@" ;;
  coco-stackgan-1)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-1 $GPU --cfg cfg/coco_s1_train.yml "$@" ;;
  coco-stackgan-2)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-2 $GPU --cfg cfg/coco_s2_train.yml "$@" ;;
  coco-attngan)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-attngan $GPU --cfg cfg/coco_attn_train.yml "$@" ;;
  damsm)
    # beyond-reference: pretrain the DAMSM encoders the attngan variant
    # consumes (the reference has users download them, README.md:33-35)
    python -m multiple_objects_gan_tpu.cli.main --variant damsm $GPU --cfg cfg/coco_damsm.yml "$@" ;;
  *)
    echo "usage: sh train.sh {mnist|clevr|coco-stackgan-1|coco-stackgan-2|coco-attngan|damsm} [extra args]"; exit 1 ;;
esac
