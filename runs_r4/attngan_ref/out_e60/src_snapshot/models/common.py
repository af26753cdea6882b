"""Model-family configuration.

One parameterized G/D family replaces the reference's four copy-pasted
codebases (SURVEY.md §7). The per-variant deltas are pure configuration:

  variant   img ch  objects  label  embed       CA-net  layout code   D cond
  mnist     1       3        10     no          no      128 -> 64     sum(one-hots), dim 10
  clevr     3       4        13     13 -> 16    no      16  -> 8      clamp(sum), dim 13
  coco-s1   3       3        81     (c||81)->128 yes    128 -> 64     mu, dim 128

Sources: code/multi-mnist/model.py, code/clevr/model.py,
code/coco/stackgan/model.py + the cfg/*.yml files.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    variant: str
    img_channels: int
    num_objects: int
    label_dim: int
    z_dim: int = 100
    gf_dim: int = 128          # cfg.GAN.GF_DIM; G width is gf_dim * 8
    df_dim: int = 64           # cfg.GAN.DF_DIM
    condition_dim: int = 128   # cfg.GAN.CONDITION_DIM
    text_dim: int = 0          # cfg.TEXT.DIMENSION (stackgan: 1024)
    use_label_embed: bool = False
    use_ca: bool = False
    use_bbox_layout: bool = True
    d_cond_dim: int = 10       # dim of the condition fed to the D cond head
    use_uncond_head: bool = False

    @property
    def ngf(self) -> int:
        return self.gf_dim * 8

    @property
    def layout_code_dim(self) -> int:
        # (c_dim // 8) channels at 2x2 after three stride-2 convs from 16x16
        return (self.condition_dim // 8) * 2 * 2 if self.use_bbox_layout else 0


MNIST = Stage1Config(
    variant="mnist", img_channels=1, num_objects=3, label_dim=10,
    condition_dim=128, d_cond_dim=10)

CLEVR = Stage1Config(
    variant="clevr", img_channels=3, num_objects=4, label_dim=13,
    condition_dim=16, use_label_embed=True, d_cond_dim=13)

COCO_S1 = Stage1Config(
    variant="coco-stackgan-1", img_channels=3, num_objects=3, label_dim=81,
    condition_dim=128, text_dim=1024, use_label_embed=True, use_ca=True,
    d_cond_dim=128)

PRESETS = {c.variant: c for c in (MNIST, CLEVR, COCO_S1)}
