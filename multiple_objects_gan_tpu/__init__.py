"""multiple_objects_gan_tpu — a TPU-native (JAX/Flax/XLA/Pallas) framework with the
capabilities of tohinz/multiple-objects-gan ("Generating Multiple Objects at
Spatially Distinct Locations", ICLR 2019).

Built from scratch, TPU-first:
  * the spatial-transformer core op is expressed as separable bilinear
    resampling via batched matmuls (MXU-friendly), not per-pixel gathers;
  * models are one parameterized Flax family instead of the reference's four
    copy-pasted codebases;
  * data parallelism is SPMD over a ``jax.sharding.Mesh`` (ICI collectives),
    replacing ``nn.parallel.data_parallel``;
  * train steps are jitted pure functions with explicit RNG and BatchNorm
    state threading.

Subpackages
-----------
ops       core compute ops (STN matrices, bilinear place/extract, Pallas kernels)
nn        reusable Flax modules (blocks, pathways, attention, encoders)
models    G/D assemblies per variant (stage1, stage2, attngan)
losses    adversarial (matching-aware BCE), KL, DAMSM word/sentence losses
train     jitted train steps, EMA, train loop, LR schedule
parallel  device mesh + sharding helpers
data      dataset adapters (multi-mnist, clevr, coco) + synthetic generators
io        checkpointing (orbax) + PyTorch .pth importer
config    YAML config system (same schema as the reference's cfg/*.yml)
cli       train / sample entry points
utils     image grids, logging, misc
"""

__version__ = "0.1.0"
