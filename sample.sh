#!/bin/bash
# Sampling launcher — same dataset arguments as the reference's sample.sh.
# usage: sh sample.sh {mnist|clevr|coco-stackgan-2|coco-attngan} [extra args...]
set -e
DATASET="$1"; shift || true
case "$DATASET" in
  mnist)
    python -m multiple_objects_gan_tpu.cli.main --variant multi-mnist --cfg cfg/mnist_eval.yml "$@" ;;
  clevr)
    python -m multiple_objects_gan_tpu.cli.main --variant clevr --cfg cfg/clevr_eval.yml "$@" ;;
  coco-stackgan-2)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-stackgan-2 --cfg cfg/coco_s2_eval.yml "$@" ;;
  coco-attngan)
    python -m multiple_objects_gan_tpu.cli.main --variant coco-attngan --cfg cfg/coco_attn_eval.yml "$@" ;;
  *)
    echo "usage: sh sample.sh {mnist|clevr|coco-stackgan-2|coco-attngan} [extra args]"; exit 1 ;;
esac
