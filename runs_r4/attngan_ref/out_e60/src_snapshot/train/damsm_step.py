"""DAMSM encoder pretraining step (text + image encoders, words/sent loss).

Capability BEYOND the reference: tohinz/multiple-objects-gan requires the
pretrained DAMSM model downloaded from the upstream AttnGAN repo
(/root/reference/README.md:33-35 — "obtain ... the pre-trained DAMSM model
from [taoxugit/AttnGAN]") and ships no code to produce one. This module
makes the framework self-contained: it trains RNNEncoder + CNNEncoder with
the same words_loss + sent_loss the generator later consumes
(losses/damsm.py ≙ code/coco/attngan/miscc/losses.py:20-132), following
upstream AttnGAN's pretrain_DAMSM.py semantics:

  * one Adam(betas=(0.5, 0.999)) over the trainable params: the whole RNN
    encoder plus ONLY the CNN encoder's projection heads (emb_features /
    emb_cnn_code) — the Inception backbone is frozen (upstream sets
    requires_grad=False on everything, then re-enables the two heads);
  * loss = w_loss0 + w_loss1 + s_loss0 + s_loss1 (GAMMA1/2/3 from cfg);
  * clip_grad_norm(rnn params, cfg.TRAIN.RNN_GRAD_CLIP=0.25) before the
    optimizer step — RNN grads only, exactly like upstream.

TPU-first notes: because only the projection heads of the CNN encoder are
differentiated, autodiff never builds the Inception backward — the
backbone runs forward-only (and in bf16 under the --bf16 knob). The
backbone's BatchNorm uses running statistics (train=False): it is a frozen
feature extractor, so batch-stat updates on it would only make the frozen
features drift between train and eval.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array

# CNN encoder params trained during DAMSM pretraining (upstream
# pretrain_DAMSM.py re-enables exactly these two submodules)
TRAINABLE_IMAGE_KEYS = ("emb_features", "emb_cnn_code")


@struct.dataclass
class DAMSMTrainState:
    """Pretraining state: both encoder variable trees + one optimizer.

    ``image_params`` holds the FULL CNN encoder tree (frozen backbone
    included) so checkpoints restore byte-identically; the optimizer
    state only covers (text_params, image ``emb_*`` subtree).
    """

    step: jax.Array
    text_params: Any
    image_params: Any
    image_stats: Any
    opt: Any


def image_emb_subtree(image_params: dict) -> dict:
    return {k: image_params[k] for k in TRAINABLE_IMAGE_KEYS}


def make_damsm_optimizer() -> optax.GradientTransformation:
    """Adam core (lr applied per step, like train/step.py:make_optimizer);
    upstream: Adam(para, lr=cfg.TRAIN.ENCODER_LR, betas=(0.5, 0.999))."""
    return optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)


def create_damsm_state(text_enc, image_enc, rng, batch_size: int = 2,
                       seq_len: int = 12, image_size: int = 64,
                       image_vars: Optional[dict] = None,
                       text_vars: Optional[dict] = None) -> DAMSMTrainState:
    """Init both encoders (jitted — eager init over a tunneled TPU pays
    per-op RPC latency) or adopt pre-built variable trees (e.g. a
    torchvision-Inception backbone imported via $INCEPTION_V3_WEIGHTS)."""
    rng_t, rng_i = jax.random.split(rng)
    if text_vars is None:
        caps = jnp.ones((batch_size, seq_len), jnp.int32)
        lens = jnp.full((batch_size,), seq_len, jnp.int32)
        text_vars = jax.jit(lambda r: text_enc.init(
            r, caps, lens, train=False))(rng_t)
    if image_vars is None:
        img = jnp.zeros((batch_size, image_size, image_size, 3))
        image_vars = jax.jit(lambda r: image_enc.init(
            r, img, train=False))(rng_i)
    text_params = text_vars["params"]
    image_params = image_vars["params"]
    tx = make_damsm_optimizer()
    opt = tx.init((text_params, image_emb_subtree(image_params)))
    return DAMSMTrainState(
        step=jnp.zeros((), jnp.int32), text_params=text_params,
        image_params=image_params,
        image_stats=image_vars.get("batch_stats", {}), opt=opt)


def make_damsm_train_step(text_enc, image_enc, smooth: Optional[dict] = None,
                          grad_clip: float = 0.25) -> Callable:
    """Returns train_step(state, batch, rng, lr) -> (state, metrics).

    batch: image{S} uint8 (largest scale is used), captions (B, T) int32
    0-padded, cap_lens (B,), class_ids (B,).
    """
    from multiple_objects_gan_tpu.losses.damsm import sent_loss, words_loss
    from multiple_objects_gan_tpu.utils.images import as_model_image

    sm = {"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0}
    if smooth:
        sm.update(smooth)
    tx = make_damsm_optimizer()

    def train_step(state: DAMSMTrainState, batch: dict, rng: Array,
                   lr: Array):
        rng = jax.random.fold_in(rng, state.step)
        captions = batch["captions"]
        cap_lens = batch["cap_lens"]
        class_ids = batch.get("class_ids")
        image_key = max((k for k in batch if k.startswith("image")),
                        key=lambda k: int(k[5:]))
        imgs = as_model_image(batch[image_key])

        def loss_fn(text_params, emb_params):
            region, cnn_code = image_enc.apply(
                {"params": {**state.image_params, **emb_params},
                 "batch_stats": state.image_stats}, imgs, train=False)
            words_emb, sent_emb = text_enc.apply(
                {"params": text_params}, captions, cap_lens, train=True,
                dropout_rng=rng)
            w0, w1, _ = words_loss(region, words_emb, cap_lens, class_ids,
                                   sm["GAMMA1"], sm["GAMMA2"], sm["GAMMA3"])
            s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, sm["GAMMA3"])
            total = w0 + w1 + s0 + s1
            return total, {"w_loss": w0 + w1, "s_loss": s0 + s1,
                           "damsm_loss": total}

        (_, metrics), (g_text, g_emb) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                state.text_params, image_emb_subtree(state.image_params))

        # clip_grad_norm on the RNN params ONLY (upstream
        # pretrain_DAMSM.py; cfg.TRAIN.RNN_GRAD_CLIP)
        norm = optax.global_norm(g_text)
        scale = jnp.minimum(1.0, grad_clip / jnp.maximum(norm, 1e-12))
        g_text = jax.tree.map(lambda g: g * scale, g_text)

        upd, opt_new = tx.update((g_text, g_emb), state.opt)
        upd_text, upd_emb = jax.tree.map(lambda u: -lr * u, upd)
        text_new = optax.apply_updates(state.text_params, upd_text)
        image_new = {**state.image_params,
                     **optax.apply_updates(
                         image_emb_subtree(state.image_params), upd_emb)}
        new_state = state.replace(step=state.step + 1, text_params=text_new,
                                  image_params=image_new, opt=opt_new)
        return new_state, {**metrics, "rnn_grad_norm": norm}

    return train_step


def make_damsm_eval_fn(text_enc, image_enc,
                       smooth: Optional[dict] = None) -> Callable:
    """Eval-split DAMSM loss (upstream pretrain_DAMSM.py evaluate()):
    no dropout, same words+sent loss. Returns eval_fn(state, batch)."""
    from multiple_objects_gan_tpu.losses.damsm import sent_loss, words_loss
    from multiple_objects_gan_tpu.utils.images import as_model_image

    sm = {"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0}
    if smooth:
        sm.update(smooth)

    def eval_fn(state: DAMSMTrainState, batch: dict):
        captions = batch["captions"]
        cap_lens = batch["cap_lens"]
        class_ids = batch.get("class_ids")
        image_key = max((k for k in batch if k.startswith("image")),
                        key=lambda k: int(k[5:]))
        imgs = as_model_image(batch[image_key])
        region, cnn_code = image_enc.apply(
            {"params": state.image_params,
             "batch_stats": state.image_stats}, imgs, train=False)
        words_emb, sent_emb = text_enc.apply(
            {"params": state.text_params}, captions, cap_lens, train=False)
        w0, w1, _ = words_loss(region, words_emb, cap_lens, class_ids,
                               sm["GAMMA1"], sm["GAMMA2"], sm["GAMMA3"])
        s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, sm["GAMMA3"])
        return {"w_loss": (w0 + w1).astype(jnp.float32),
                "s_loss": (s0 + s1).astype(jnp.float32),
                "damsm_loss": (w0 + w1 + s0 + s1).astype(jnp.float32)}

    return eval_fn
