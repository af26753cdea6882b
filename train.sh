#!/bin/bash
# Training launcher — same dataset arguments as the reference's train.sh.
# usage: sh train.sh {mnist|clevr|coco-stackgan-1|coco-stackgan-2|coco-attngan} [extra args...]
set -e
DATASET="$1"; shift || true
case "$DATASET" in
  mnist)
    python -m multiple_objects_gan_tpu.cli.main --variant multi-mnist --cfg cfg/mnist_train.yml "$@" ;;
  clevr)
    python -m multiple_objects_gan_tpu.cli.main --variant clevr --cfg cfg/clevr_train.yml "$@" ;;
  coco-stackgan-1)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-1 --cfg cfg/coco_s1_train.yml "$@" ;;
  coco-stackgan-2)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-2 --cfg cfg/coco_s2_train.yml "$@" ;;
  coco-attngan)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-attngan --cfg cfg/coco_attn_train.yml "$@" ;;
  *)
    echo "usage: sh train.sh {mnist|clevr|coco-stackgan-1|coco-stackgan-2|coco-attngan} [extra args]"; exit 1 ;;
esac
