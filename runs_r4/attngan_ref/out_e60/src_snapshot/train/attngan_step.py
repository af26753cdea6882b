"""AttnGAN fused train step: 3 per-scale D updates + G update with DAMSM.

Parity target: code/coco/attngan/trainer.py:264-354 and
miscc/losses.py:136-226:
  * frozen (eval-mode) text/image encoders (trainer.py:67,78);
  * per-step: encode captions (detached), G forward (3 scales), one update
    per D (separate Adams == one Adam over the disjoint union), then G:
    per-scale BCE (+uncond) + DAMSM words/sent loss on the 256px output
    * SMOOTH.LAMBDA + KL;
  * EMA of G params with decay 0.999 (trainer.py:341-342).

attngan's D heads emit probabilities (Sigmoid in the head), so the loss is
plain BCE on probabilities with torch-style log clamping.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from multiple_objects_gan_tpu.losses.damsm import sent_loss, words_loss
from multiple_objects_gan_tpu.losses.gan import kl_loss
from multiple_objects_gan_tpu.models.attngan import AttnGanConfig
from multiple_objects_gan_tpu.train.state import GANTrainState
from multiple_objects_gan_tpu.train.step import make_optimizer, maybe_remat
from multiple_objects_gan_tpu.utils.images import as_model_image

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _bce_probs_f32(p: Array, target: float) -> Array:
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-44)), -100.0)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-44)), -100.0)
    return -jnp.mean(target * logp + (1.0 - target) * log1mp)


def _bce_probs_fwd(p, target):
    return _bce_probs_f32(p, target), p


def _bce_probs_bwd(target, p, g):
    # torch binary_cross_entropy backward: (p - y) / clamp_min(p(1-p),
    # 1e-12) / numel. The naive jnp.log grad is 1/p — unbounded down to
    # ~1e44 when a saturated D sigmoid returns a subnormal, which
    # overflows f32 and NaNs the whole step (seen on full-width attngan
    # with random encoders); torch's clamp bounds it at 1e12.
    denom = jnp.maximum(p * (1.0 - p), 1e-12)
    return (g * (p - target) / denom / p.size,)


_bce_probs_f32.defvjp(_bce_probs_fwd, _bce_probs_bwd)


def bce_probs(p: Array, target: float) -> Array:
    """torch BCELoss on probabilities (log clamped to >= -100; backward
    denominator clamped to 1e-12, both exactly as torch)."""
    return _bce_probs_f32(p.astype(jnp.float32), float(target))


def _d_loss_one_scale(d_module, d_params, d_stats, real, fake, cond,
                      labels, bbox, with_obj: bool, with_uncond: bool):
    """miscc/losses.py:136-174 for one D; threads BN stats sequentially."""
    def fwd(variables, img, method=None, extra=()):
        if method is None:
            args = ((img, labels, bbox) if with_obj else (img, None, None))
            return d_module.apply(variables, *args, train=True,
                                  mutable=["batch_stats"])
        return d_module.apply(variables, img, *extra, train=True,
                              method=method, mutable=["batch_stats"])

    dv = {"params": d_params, "batch_stats": d_stats}
    feat_real, s = fwd(dv, real)
    dv = {"params": d_params, **s}
    feat_fake, s = fwd(dv, jax.lax.stop_gradient(fake))
    b = real.shape[0]
    dv = {"params": d_params, **s}
    p_real, s = d_module.apply(dv, feat_real, cond, train=True,
                               method="cond_logits", mutable=["batch_stats"])
    dv = {"params": d_params, **s}
    p_fake, s = d_module.apply(dv, feat_fake, cond, train=True,
                               method="cond_logits", mutable=["batch_stats"])
    dv = {"params": d_params, **s}
    p_wrong, s = d_module.apply(dv, feat_real[: b - 1], cond[1:], train=True,
                                method="cond_logits", mutable=["batch_stats"])
    err_real = bce_probs(p_real, 1.0)
    err_fake = bce_probs(p_fake, 0.0)
    err_wrong = bce_probs(p_wrong, 0.0)
    if with_uncond:
        dv = {"params": d_params, **s}
        pu_real, s = d_module.apply(dv, feat_real, train=True,
                                    method="uncond_logits",
                                    mutable=["batch_stats"])
        dv = {"params": d_params, **s}
        pu_fake, s = d_module.apply(dv, feat_fake, train=True,
                                    method="uncond_logits",
                                    mutable=["batch_stats"])
        err = ((err_real + bce_probs(pu_real, 1.0)) / 2.0
               + (err_fake + err_wrong + bce_probs(pu_fake, 0.0)) / 3.0)
    else:
        err = err_real + (err_fake + err_wrong) / 2.0
    return err, s["batch_stats"]


def create_attngan_state(cfg: AttnGanConfig, g_module, d_modules: dict,
                         rng, batch_size: int = 2,
                         seq_len: int = 12) -> GANTrainState:
    """d_modules: {'d64': DNet64, 'd128': DNetScale, 'd256': DNetScale}
    (subset allowed for branch_num < 3)."""
    rng_g, rng_d, rng_ca = jax.random.split(rng, 3)
    b, o = batch_size, cfg.num_objects
    z = jnp.zeros((b, cfg.z_dim))
    sent = jnp.zeros((b, cfg.embedding_dim))
    words = jnp.zeros((b, seq_len, cfg.embedding_dim))
    mask = jnp.zeros((b, seq_len), bool)
    bbox = jnp.tile(jnp.array([0.25, 0.25, 0.5, 0.5]), (b, o, 1))
    labels = jnp.zeros((b, o, cfg.label_dim)).at[:, :, 0].set(1.0)

    # jitted inits: see train/step.py — eager init over a tunneled TPU
    # pays per-op RPC latency
    g_vars = jax.jit(lambda r: g_module.init(
        r, z, sent, words, mask, bbox, labels, train=True,
        ca_rng=rng_ca))(rng_g)
    d_params, d_stats = {}, {}
    for name, mod in d_modules.items():
        scale = int(name[1:])
        img = jnp.zeros((b, scale, scale, 3))
        if name == "d64":
            v = jax.jit(lambda r, m=mod, im=img: m.init(
                r, im, labels, bbox, train=True))(rng_d)
        else:
            v = jax.jit(lambda r, m=mod, im=img: m.init(
                r, im, train=True))(rng_d)
        h = jnp.zeros((b, 4, 4, cfg.df_dim * 8))
        c = jnp.zeros((b, cfg.embedding_dim))
        vh = jax.jit(lambda r, m=mod: m.init(
            r, h, c, train=True, method="cond_logits"))(rng_d)
        vu = jax.jit(lambda r, m=mod: m.init(
            r, h, train=True, method="uncond_logits"))(rng_d)
        d_params[name] = {**v["params"], **vh["params"], **vu["params"]}
        d_stats[name] = {**v.get("batch_stats", {}),
                         **vh.get("batch_stats", {}),
                         **vu.get("batch_stats", {})}

    tx = make_optimizer()
    g_params = g_vars["params"]
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, d_params=d_params,
        g_stats=g_vars.get("batch_stats", {}), d_stats=d_stats,
        g_opt=tx.init(g_params),
        # one Adam per D (trainer.py:137-159) == dict of optimizer states
        d_opt={k: tx.init(v) for k, v in d_params.items()},
        g_ema=jax.tree.map(jnp.copy, g_params))


def make_attngan_train_step(cfg: AttnGanConfig, g_module, d_modules: dict,
                            text_encoder, image_encoder,
                            smooth: Optional[dict] = None,
                            ema_decay: float = 0.999) -> Callable:
    """Returns train_step(state, enc_vars, batch, rng, lr_g, lr_d).

    enc_vars: {'text': text-encoder variables, 'image': image-encoder
    variables} — frozen, eval mode. batch: image64/128/256, captions
    (B, T) int32 0-padded, cap_lens (B,), class_ids (B,), bbox,
    label_onehot.
    """
    sm = {"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0, "LAMBDA": 50.0}
    if smooth:
        sm.update(smooth)
    tx = make_optimizer()
    scales = sorted(d_modules, key=lambda n: int(n[1:]))

    def train_step(state: GANTrainState, enc_vars: dict, batch: dict,
                   rng: Array, lr_g: Array, lr_d: Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_z, rng_ca = jax.random.split(rng)
        captions = batch["captions"]
        cap_lens = batch["cap_lens"]
        labels = batch["label_onehot"]
        bbox = batch["bbox"]
        class_ids = batch.get("class_ids")
        b = captions.shape[0]
        z = jax.random.normal(rng_z, (b, cfg.z_dim), jnp.float32)

        # frozen text encoder (eval), detached (trainer.py:284-285)
        words_embs, sent_emb = text_encoder.apply(
            enc_vars["text"], captions, cap_lens, train=False)
        words_embs = jax.lax.stop_gradient(words_embs)
        sent_emb = jax.lax.stop_gradient(sent_emb)
        mask = captions == 0                          # trainer.py:286-289

        # ---- G forward once (vjp saved) ------------------------------
        def g_fwd(g_params):
            out, new_vars = g_module.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                z, sent_emb, words_embs, mask, bbox, labels, train=True,
                ca_rng=rng_ca, mutable=["batch_stats"])
            prim = {"imgs": tuple(out["imgs"]), "mu": out["mu"],
                    "logvar": out["logvar"]}
            return prim, new_vars["batch_stats"]

        # MOG_REMAT: see train/step.py:maybe_remat (measured losing on
        # this step too — ROADMAP "Remat policy A/B"; knob kept for
        # beyond-reference widths where activations outgrow HBM)
        prim, g_vjp, g_stats_new = jax.vjp(maybe_remat(g_fwd),
                                           state.g_params, has_aux=True)

        # ---- per-scale D updates --------------------------------------
        d_params_new, d_opt_new, d_stats_new = {}, {}, {}
        d_losses = {}
        for i, name in enumerate(scales):
            mod = d_modules[name]
            # uint8 transport -> [-1, 1] on device (fuses into D)
            real = as_model_image(batch[f"image{name[1:]}"])
            fake = prim["imgs"][i]

            def d_loss_fn(p, mod=mod, name=name, real=real, fake=fake):
                return _d_loss_one_scale(
                    mod, p, state.d_stats[name], real, fake, sent_emb,
                    labels, bbox, with_obj=(name == "d64"),
                    with_uncond=True)

            (err_d, stats), grads = jax.value_and_grad(
                maybe_remat(d_loss_fn), has_aux=True)(
                state.d_params[name])
            upd, d_opt_new[name] = tx.update(
                grads, state.d_opt[name], state.d_params[name])
            d_params_new[name] = optax.apply_updates(
                state.d_params[name],
                jax.tree.map(lambda u: -lr_d * u, upd))
            d_stats_new[name] = stats
            d_losses[f"d_loss_{name}"] = err_d

        # ---- G update through updated Ds ------------------------------
        def g_loss_fn(prim_in):
            total = 0.0
            aux = {}
            stats_out = dict(d_stats_new)
            for i, name in enumerate(scales):
                mod = d_modules[name]
                fake = prim_in["imgs"][i]
                dv = {"params": d_params_new[name],
                      "batch_stats": stats_out[name]}
                if name == "d64":
                    feat, s = mod.apply(dv, fake, labels, bbox, train=True,
                                        mutable=["batch_stats"])
                else:
                    feat, s = mod.apply(dv, fake, train=True,
                                        mutable=["batch_stats"])
                dv = {"params": d_params_new[name], **s}
                p_cond, s = mod.apply(dv, feat, sent_emb, train=True,
                                      method="cond_logits",
                                      mutable=["batch_stats"])
                dv = {"params": d_params_new[name], **s}
                p_unc, s = mod.apply(dv, feat, train=True,
                                     method="uncond_logits",
                                     mutable=["batch_stats"])
                g_i = bce_probs(p_cond, 1.0) + bce_probs(p_unc, 1.0)
                aux[f"g_loss_{name}"] = g_i
                total = total + g_i
                stats_out[name] = s["batch_stats"]

            # DAMSM on the largest scale (losses.py:205-224)
            region, cnn_code = image_encoder.apply(
                enc_vars["image"], prim_in["imgs"][-1], train=False)
            w0, w1, _ = words_loss(region, words_embs, cap_lens, class_ids,
                                   sm["GAMMA1"], sm["GAMMA2"], sm["GAMMA3"])
            s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, sm["GAMMA3"])
            w = (w0 + w1) * sm["LAMBDA"]
            sl = (s0 + s1) * sm["LAMBDA"]
            kl = kl_loss(prim_in["mu"], prim_in["logvar"])
            total = total + w + sl + kl
            aux.update({"w_loss": w, "s_loss": sl, "kl_loss": kl})
            return total, (stats_out, aux)

        (err_g, (d_stats_final, g_aux)), prim_bar = jax.value_and_grad(
            maybe_remat(g_loss_fn), has_aux=True)(prim)
        (g_grads,) = g_vjp(prim_bar)
        g_upd, g_opt_new = tx.update(g_grads, state.g_opt, state.g_params)
        g_params_new = optax.apply_updates(
            state.g_params, jax.tree.map(lambda u: -lr_g * u, g_upd))

        g_ema_new = jax.tree.map(
            lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
            state.g_ema, g_params_new)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params_new,
            d_params=d_params_new, g_stats=g_stats_new,
            d_stats=d_stats_final, g_opt=g_opt_new,
            d_opt=d_opt_new, g_ema=g_ema_new)
        metrics = {"g_loss_total": err_g, **d_losses, **g_aux}
        return new_state, metrics

    return train_step


