from multiple_objects_gan_tpu.losses.gan import (
    bce_with_logits,
    discriminator_loss,
    generator_adv_loss,
    kl_loss,
)

__all__ = [
    "bce_with_logits",
    "discriminator_loss",
    "generator_adv_loss",
    "kl_loss",
]
