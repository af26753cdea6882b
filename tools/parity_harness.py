"""One-command offline FID/IS parity harness (BASELINE.md north star).

Takes a reference-format NET_G .pth (e.g. the published coco_AttnGAN2.pth)
plus a data dir, and in ONE invocation runs
  importer -> reference-composition sample dump (condGANTrainer.sampling
  semantics, code/coco/attngan/trainer.py:387-472) -> in-repo FID + IS
and prints ONE JSON line with the metrics and their provenance. On real
hardware with the published checkpoints + real COCO this IS the FID-parity
demonstration; the same command smoke-runs end-to-end on synthetic
stand-ins (tests/test_parity_harness.py).

Usage:
  python tools/parity_harness.py \
      --net_g <netG .pth | orbax run dir> --data_dir <coco dir> \
      [--img_dir <jpeg dir>] [--net_e <DAMSM text_encoder .pth>] \
      [--cfg cfg/coco_attn_eval.yml] [--out <dir>] [--num_images 30000] \
      [--seed N]

For published-number comparability also set $INCEPTION_V3_WEIGHTS to a
torchvision inception_v3 state_dict (the IS classifier head) and pass
--net_e so FID's Inception backbone uses the DAMSM image_encoder weights
(found next to the text encoder, as the reference expects).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_merged_cfg(base_cfg: str, out_dir: str, net_g: str, net_e: str,
                     data_dir: str, img_dir: str) -> str:
    """Write a merged eval yml: base cfg + NET_G/NET_E/paths overrides.

    The strict config merge (config/config.py) validates keys/types, so
    the override yml only touches keys the reference schema already has
    (TRAIN.NET_G / TRAIN.NET_E / DATA_DIR / IMG_DIR / TRAIN.FLAG /
    B_VALIDATION)."""
    import yaml

    with open(base_cfg) as f:
        doc = yaml.safe_load(f) or {}
    doc.setdefault("TRAIN", {})
    doc["TRAIN"]["FLAG"] = False
    doc["TRAIN"]["NET_G"] = net_g
    if net_e:
        doc["TRAIN"]["NET_E"] = net_e
    if data_dir:
        doc["DATA_DIR"] = data_dir
    if img_dir:
        doc["IMG_DIR"] = img_dir
    merged = os.path.join(out_dir, "parity_eval.yml")
    with open(merged, "w") as f:
        yaml.safe_dump(doc, f)
    return merged


def main(argv=None):
    p = argparse.ArgumentParser(
        description="NET_G .pth + data dir -> sample dump -> FID/IS, "
                    "one shot")
    p.add_argument("--net_g", required=True,
                   help="reference netG .pth (importer path) or an orbax "
                        "run/models dir from our own training")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--img_dir", default="")
    p.add_argument("--net_e", default="",
                   help="DAMSM text_encoder .pth; the image_encoder .pth "
                        "is looked up next to it (reference convention)")
    p.add_argument("--cfg", default=os.path.join(REPO, "cfg",
                                                 "coco_attn_eval.yml"))
    p.add_argument("--out", default="")
    p.add_argument("--num_images", type=int, default=0,
                   help="cap the dump (0 = full test split; reference "
                        "uses 30000)")
    p.add_argument("--seed", type=int, default=100)
    args = p.parse_args(argv)

    if not os.path.exists(args.net_g):
        sys.exit(f"--net_g not found: {args.net_g}")
    now = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    out_dir = args.out or os.path.join("output", f"parity_{now}")
    os.makedirs(out_dir, exist_ok=True)
    merged = build_merged_cfg(args.cfg, out_dir, args.net_g, args.net_e,
                              args.data_dir, args.img_dir)

    from multiple_objects_gan_tpu.cli.main import main as cli_main
    cli_argv = ["--variant", "coco-attngan", "--cfg", merged,
                "--output_dir", out_dir, "--manualSeed", str(args.seed),
                "--eval_mode", "sampling"]
    if args.num_images:
        cli_argv += ["--num_images", str(args.num_images)]
    cli_main(cli_argv)

    metrics_path = os.path.join(out_dir, "eval_metrics.json")
    with open(metrics_path) as f:
        m = json.load(f)
    result = {**m, "net_g": args.net_g, "net_e": args.net_e or None,
              "samples_dir": os.path.join(out_dir, "single_samples"),
              "metrics_json": metrics_path}
    # published FID numbers were computed with the pytorch-fid canonical
    # Inception (pool3, pt_inception weights) — ONLY fid_encoder ==
    # "fid_canonical" is comparable; the DAMSM backbone ("damsm") is
    # self-consistent but a different metric (VERDICT r3 missing #2)
    if (m.get("is_head") == "imported"
            and m.get("is_backbone") == "imported"
            and m.get("fid_encoder") == "fid_canonical"):
        result["comparable_to_published"] = True
    else:
        result["comparable_to_published"] = False
        print("NOTE: non-canonical weights in the metric path "
              f"(is_head={m.get('is_head')}, "
              f"is_backbone={m.get('is_backbone')}, "
              f"fid_encoder={m.get('fid_encoder')}) — numbers are NOT "
              "comparable to published FID/IS; set $FID_INCEPTION_WEIGHTS "
              "to the pytorch-fid pt_inception .pth, pass --net_e, and "
              "set $INCEPTION_V3_WEIGHTS", flush=True)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
