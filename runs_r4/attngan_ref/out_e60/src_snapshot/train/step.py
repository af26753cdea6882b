"""Jitted alternating D/G train step for the stage-1 family.

Semantics mirror the reference hot loop (code/multi-mnist/trainer.py:113-157,
code/coco/stackgan/trainer.py:155-235):

  1. one G forward produces the fakes (and mu/logvar for CA variants);
  2. D update: BCE over real/wrong/fake pairs, fakes detached
     (``errD.backward(retain_graph=True)``);
  3. G update: adversarial loss through the UPDATED D (+ KL * coeff),
     gradients flowing back through the saved G graph.

TPU-first translation: instead of PyTorch's retain_graph we take a
``jax.vjp`` of the G forward — one forward + one backward per step, same
cost profile — and the whole alternating update compiles to a single XLA
program. BatchNorm running stats are threaded functionally through every
forward in the reference's exact call order (real, fake, head-real,
head-wrong, head-fake). Under a sharded-batch jit the grads are all-reduced
by XLA collectives over the mesh (replacing DataParallel's gather).

Per-variant conditioning of the D head (cond_mode):
  * "label_sum"        — mnist: sum of the raw one-hots
                         (miscc/utils.py:78)
  * "label_sum_clamp"  — clevr: negatives clamped to 0
                         (code/clevr/miscc/utils.py:98-99)
  * "mu"               — stackgan: CA-net mu, detached in BOTH losses
                         (code/coco/stackgan/miscc/utils.py:80,117)
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from multiple_objects_gan_tpu.losses import (
    discriminator_loss,
    generator_adv_loss,
    kl_loss,
)
from multiple_objects_gan_tpu.models.common import Stage1Config
from multiple_objects_gan_tpu.train.state import GANTrainState
from multiple_objects_gan_tpu.utils.images import as_model_image

Array = jax.Array


def maybe_remat(fn):
    """Apply the MOG_REMAT rematerialization policy to a differentiated
    function (read at TRACE time). Values:

      * ``0`` (default) — save everything (no remat);
      * ``full``/``1`` — ``jax.checkpoint`` with nothing saved: recompute
        the whole forward in the backward;
      * ``convs`` — save conv/dot outputs, rematerialize everything else
        (BN normalization, activations): the textbook
        recompute-elementwise-for-bytes policy on an HBM-bound conv net;
      * ``dots`` — ``jax.checkpoint_policies.dots_saveable`` (dot_general
        only; convs recomputed).

    Measured on TPU v5e (tools/spike_remat.py, bf16, real chip): every
    policy LOSES on these steps — the saved-activation traffic is not the
    bandwidth bottleneck (it is intra-conv); see ROADMAP "Remat policy
    A/B". Knob kept for bigger-than-reference configs where activations
    stop fitting HBM."""
    mode = os.environ.get("MOG_REMAT", "0").lower()
    if mode in ("", "0", "false", "off"):
        return fn
    if mode in ("1", "true", "on", "full"):
        return jax.checkpoint(fn)
    if mode == "dots":
        return jax.checkpoint(fn,
                              policy=jax.checkpoint_policies.dots_saveable)
    if mode == "convs":
        def conv_saveable(prim, *_, **__):
            return prim.name in ("conv_general_dilated", "dot_general")

        return jax.checkpoint(fn, policy=conv_saveable)
    raise ValueError(f"MOG_REMAT={mode!r}: expected 0|full|convs|dots")


def make_optimizer() -> optax.GradientTransformation:
    """Adam(b1=0.5, b2=0.999, eps=1e-8) core; lr applied per step so the
    epoch-halving schedule (trainer.py:105-111) is a plain scalar input."""
    return optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8)


def _cond(cfg: Stage1Config, label_onehot: Array,
          mu: Optional[Array]) -> Array:
    if cfg.use_ca:
        # stackgan: condition is mu, detached in both D and G losses
        return jax.lax.stop_gradient(mu)
    cond = label_onehot.sum(axis=1)
    if cfg.variant == "clevr":
        cond = jnp.maximum(cond, 0.0)
    return cond


def create_state(cfg: Stage1Config, g_module, d_module, rng,
                 batch_size: int = 2, use_ema: bool = False) -> GANTrainState:
    """Initialize G/D params, stats and optimizer state with tiny dummies."""
    rng_g, rng_d, rng_z, rng_ca = jax.random.split(rng, 4)
    b, o = batch_size, cfg.num_objects
    z = jnp.zeros((b, cfg.z_dim))
    bbox = jnp.tile(jnp.array([0.25, 0.25, 0.5, 0.5]), (b, o, 1))
    labels = jnp.zeros((b, o, cfg.label_dim)).at[:, :, 0].set(1.0)
    text = jnp.zeros((b, cfg.text_dim)) if cfg.use_ca else None
    img = jnp.zeros((b, 64, 64, cfg.img_channels))

    # jit the inits: eager init costs one device round-trip per op,
    # which is minutes over a tunneled TPU for the full-size models
    g_vars = jax.jit(lambda r: g_module.init(
        r, z, bbox, labels, text, train=True,
        ca_rng=rng_ca if cfg.use_ca else None))(rng_g)
    d_vars = jax.jit(lambda r: d_module.init(
        r, img, labels, bbox, train=True))(rng_d)
    # heads are only reachable via methods; init them too
    h = jnp.zeros((b, 4, 4, cfg.df_dim * 8))
    c = jnp.zeros((b, cfg.d_cond_dim))
    d_head = jax.jit(lambda r: d_module.init(
        r, h, c, train=True, method="cond_logits"))(rng_d)
    d_params = {**d_vars["params"], **d_head["params"]}
    d_stats = {**d_vars.get("batch_stats", {}), **d_head.get("batch_stats", {})}
    if cfg.use_uncond_head:
        d_uhead = jax.jit(lambda r: d_module.init(
            r, h, train=True, method="uncond_logits"))(rng_d)
        d_params.update(d_uhead["params"])
        d_stats.update(d_uhead.get("batch_stats", {}))

    tx = make_optimizer()
    g_params = g_vars["params"]
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_stats=g_vars.get("batch_stats", {}),
        d_stats=d_stats,
        g_opt=tx.init(g_params),
        d_opt=tx.init(d_params),
        g_ema=jax.tree.map(jnp.copy, g_params) if use_ema else None,
    )


def _fused_alternating_step(tx, state: GANTrainState, g_fwd, d_module,
                            image: Array, feat_args: tuple, cond_fn,
                            *, use_uncond: bool, kl_coeff: Optional[float],
                            lr_g: Array, lr_d: Array,
                            ema_decay: Optional[float] = None):
    """The shared D-then-G alternating update core (both stages).

    One G forward with its VJP saved (≙ the reference's
    ``errD.backward(retain_graph=True)``, trainer.py:142-157); D update
    over real/wrong/fake (+ optional uncond head) with BN stats threaded
    in the reference's call order; G update THROUGH THE UPDATED D.

    g_fwd(g_params) -> (prim dict with 'img' [+ 'mu'/'logvar'], new_g_stats)
    d_module.apply(dv, img, *feat_args, ...) is the feature forward;
    cond_fn(prim) -> the matching-aware condition (label sum / clamped
    sum / mu per variant). kl_coeff=None disables the CA KL term.
    """
    prim, g_vjp, g_stats_new = jax.vjp(g_fwd, state.g_params, has_aux=True)
    fake = prim["img"]
    b = image.shape[0]

    # ---- D update ------------------------------------------------------
    def d_loss_fn(d_params):
        dv = {"params": d_params, "batch_stats": state.d_stats}
        feat_real, s = d_module.apply(dv, image, *feat_args, train=True,
                                      mutable=["batch_stats"])
        dv = {"params": d_params, **s}
        feat_fake, s = d_module.apply(dv, jax.lax.stop_gradient(fake),
                                      *feat_args, train=True,
                                      mutable=["batch_stats"])
        cond = cond_fn(prim)
        dv = {"params": d_params, **s}
        real_logits, s = d_module.apply(dv, feat_real, cond, train=True,
                                        method="cond_logits",
                                        mutable=["batch_stats"])
        dv = {"params": d_params, **s}
        wrong_logits, s = d_module.apply(dv, feat_real[: b - 1],
                                         cond[1:], train=True,
                                         method="cond_logits",
                                         mutable=["batch_stats"])
        dv = {"params": d_params, **s}
        fake_logits, s = d_module.apply(dv, feat_fake, cond, train=True,
                                        method="cond_logits",
                                        mutable=["batch_stats"])
        u_real = u_fake = None
        if use_uncond:
            dv = {"params": d_params, **s}
            u_real, s = d_module.apply(dv, feat_real, train=True,
                                       method="uncond_logits",
                                       mutable=["batch_stats"])
            dv = {"params": d_params, **s}
            u_fake, s = d_module.apply(dv, feat_fake, train=True,
                                       method="uncond_logits",
                                       mutable=["batch_stats"])
        err_d, aux = discriminator_loss(real_logits, wrong_logits,
                                        fake_logits, u_real, u_fake)
        return err_d, (s["batch_stats"], aux)

    (err_d, (d_stats_new, d_aux)), d_grads = jax.value_and_grad(
        maybe_remat(d_loss_fn), has_aux=True)(state.d_params)
    d_updates, d_opt_new = tx.update(d_grads, state.d_opt, state.d_params)
    d_params_new = optax.apply_updates(
        state.d_params, jax.tree.map(lambda u: -lr_d * u, d_updates))

    # ---- G update through the UPDATED D ---------------------------------
    def g_loss_fn(prim_in):
        dv = {"params": d_params_new, "batch_stats": d_stats_new}
        feat_fake, s = d_module.apply(dv, prim_in["img"], *feat_args,
                                      train=True, mutable=["batch_stats"])
        cond = cond_fn(prim_in)
        dv = {"params": d_params_new, **s}
        fake_logits, s = d_module.apply(dv, feat_fake, cond, train=True,
                                        method="cond_logits",
                                        mutable=["batch_stats"])
        u_fake = None
        if use_uncond:
            dv = {"params": d_params_new, **s}
            u_fake, s = d_module.apply(dv, feat_fake, train=True,
                                       method="uncond_logits",
                                       mutable=["batch_stats"])
        adv = generator_adv_loss(fake_logits, u_fake)
        total = adv
        aux = {"g_loss": adv}
        if kl_coeff is not None:
            kl = kl_loss(prim_in["mu"], prim_in["logvar"])
            total = total + kl * kl_coeff
            aux["kl_loss"] = kl
        return total, (s["batch_stats"], aux)

    (err_g, (d_stats_final, g_aux)), prim_bar = jax.value_and_grad(
        maybe_remat(g_loss_fn), has_aux=True)(prim)
    (g_grads,) = g_vjp(prim_bar)
    g_updates, g_opt_new = tx.update(g_grads, state.g_opt, state.g_params)
    g_params_new = optax.apply_updates(
        state.g_params, jax.tree.map(lambda u: -lr_g * u, g_updates))

    g_ema_new = state.g_ema
    if state.g_ema is not None and ema_decay is not None:
        g_ema_new = jax.tree.map(
            lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
            state.g_ema, g_params_new)

    new_state = state.replace(
        step=state.step + 1,
        g_params=g_params_new, d_params=d_params_new,
        g_stats=g_stats_new, d_stats=d_stats_final,
        g_opt=g_opt_new, d_opt=d_opt_new, g_ema=g_ema_new)
    metrics = {"d_loss": err_d, "g_loss_total": err_g, **d_aux, **g_aux}
    return new_state, metrics


def make_train_step(cfg: Stage1Config, g_module, d_module,
                    kl_coeff: float = 2.0,
                    ema_decay: Optional[float] = None) -> Callable:
    """Build the fused alternating train step (jit it at the call site)."""
    tx = make_optimizer()

    def train_step(state: GANTrainState, batch: dict, rng: Array,
                   lr_g: Array, lr_d: Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_z, rng_ca = jax.random.split(rng)
        # batches ship images as raw uint8 (4x fewer host->device bytes);
        # the [-1, 1] normalize runs on-device and fuses into D's first conv
        image = as_model_image(batch["image"])
        labels = batch["label_onehot"]
        bbox = batch["bbox"]
        text = batch.get("text_embedding")
        b = image.shape[0]
        z = jax.random.normal(rng_z, (b, cfg.z_dim), jnp.float32)

        def g_fwd(g_params):
            out, new_vars = g_module.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                z, bbox, labels, text, train=True,
                ca_rng=rng_ca if cfg.use_ca else None,
                mutable=["batch_stats"])
            prim = {"img": out["img"]}
            if cfg.use_ca:
                prim["mu"] = out["mu"]
                prim["logvar"] = out["logvar"]
            return prim, new_vars["batch_stats"]

        # MOG_REMAT: recompute activations during the backward instead of
        # loading saved ones — the step sits at the HBM roofline with the
        # MXU ~1/3 idle, so trading FLOPs for bytes could pay (it does
        # not, measured; see maybe_remat)
        return _fused_alternating_step(
            tx, state, maybe_remat(g_fwd), d_module, image, (labels, bbox),
            lambda prim: _cond(cfg, labels, prim.get("mu")),
            use_uncond=cfg.use_uncond_head,
            kl_coeff=kl_coeff if cfg.use_ca else None,
            lr_g=lr_g, lr_d=lr_d, ema_decay=ema_decay)

    return train_step


def create_state_stage2(cfg, g2_module, d2_module, rng,
                        batch_size: int = 2) -> GANTrainState:
    """Initialize stage-2 G/D (stage-1 weights live outside this state)."""
    rng_g, rng_d, rng_ca = jax.random.split(rng, 3)
    b, o = batch_size, cfg.num_objects
    s1_img = jnp.zeros((b, 64, 64, cfg.img_channels))
    bbox = jnp.tile(jnp.array([0.25, 0.25, 0.5, 0.5]), (b, o, 1))
    labels = jnp.zeros((b, o, cfg.label_dim)).at[:, :, 0].set(1.0)
    text = jnp.zeros((b, cfg.text_dim))
    img256 = jnp.zeros((b, 256, 256, cfg.img_channels))

    g_vars = jax.jit(lambda r: g2_module.init(
        r, s1_img, bbox, bbox, labels, text, train=True,
        ca_rng=rng_ca))(rng_g)
    d_vars = jax.jit(lambda r: d2_module.init(
        r, img256, labels, bbox, train=True))(rng_d)
    h = jnp.zeros((b, 4, 4, cfg.df_dim * 8))
    c = jnp.zeros((b, cfg.d_cond_dim))
    d_head = jax.jit(lambda r: d2_module.init(
        r, h, c, train=True, method="cond_logits"))(rng_d)
    d_uhead = jax.jit(lambda r: d2_module.init(
        r, h, train=True, method="uncond_logits"))(rng_d)
    d_params = {**d_vars["params"], **d_head["params"], **d_uhead["params"]}
    d_stats = {**d_vars.get("batch_stats", {}),
               **d_head.get("batch_stats", {}),
               **d_uhead.get("batch_stats", {})}

    tx = make_optimizer()
    g_params = g_vars["params"]
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, d_params=d_params,
        g_stats=g_vars.get("batch_stats", {}), d_stats=d_stats,
        g_opt=tx.init(g_params), d_opt=tx.init(d_params))


def make_stage2_train_step(cfg, s1_cfg, g1_module, g2_module, d2_module,
                           kl_coeff: float = 2.0) -> Callable:
    """Stage-2 alternating step (code/coco/stackgan/trainer.py:155-235,
    STAGE=2 branch). The frozen stage-1 G runs inside the step (its params
    are step INPUTS, never updated — matching requires_grad=False +
    stage1_img.detach(), model.py:317-320,385). D consumes the 256px images
    with the STAGE-2-scale bboxes. The uncond head is active
    (model.py:483-484)."""
    tx = make_optimizer()

    def train_step(state: GANTrainState, s1_vars: dict, batch: dict,
                   rng: Array, lr_g: Array, lr_d: Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_z, rng_ca1, rng_ca2 = jax.random.split(rng, 3)
        image = as_model_image(batch["image"])       # 256px real
        labels = batch["label_onehot"]
        bbox_s1 = batch["bbox"]
        bbox_s2 = batch["bbox_s2"]
        text = batch["text_embedding"]
        b = image.shape[0]
        z = jax.random.normal(rng_z, (b, s1_cfg.z_dim), jnp.float32)

        # frozen stage-1 G (train-mode BN, stats updates discarded)
        s1_out = g1_module.apply(
            s1_vars, z, bbox_s1, labels, text, train=True, ca_rng=rng_ca1,
            mutable=["batch_stats"])[0]
        stage1_img = jax.lax.stop_gradient(s1_out["img"])

        def g_fwd(g_params):
            out, new_vars = g2_module.apply(
                {"params": g_params, "batch_stats": state.g_stats},
                stage1_img, bbox_s1, bbox_s2, labels, text, train=True,
                ca_rng=rng_ca2, mutable=["batch_stats"])
            prim = {"img": out["img"], "mu": out["mu"],
                    "logvar": out["logvar"]}
            return prim, new_vars["batch_stats"]

        # D consumes the 256px images with the stage-2-scale bboxes; the
        # cond head is fed mu (trainer.py:211); uncond head always on
        return _fused_alternating_step(
            tx, state, g_fwd, d2_module, image, (labels, bbox_s2),
            lambda prim: jax.lax.stop_gradient(prim["mu"]),
            use_uncond=True, kl_coeff=kl_coeff, lr_g=lr_g, lr_d=lr_d)

    return train_step


def make_sample_fn(cfg: Stage1Config, g_module) -> Callable:
    """Eval-mode generation: running-stats BN. CA is deterministic
    (c = mu) unless ``ca_rng`` is passed — the reference reparametrizes
    with fresh noise at eval too (code/coco/stackgan/model.py:66-71), so
    FID-parity sampling passes an rng (--stochastic_ca)."""

    @functools.partial(jax.jit, static_argnames=())
    def sample(g_params, g_stats, z, bbox, labels, text=None, ca_rng=None):
        out = g_module.apply({"params": g_params, "batch_stats": g_stats},
                             z, bbox, labels, text, train=False,
                             ca_rng=ca_rng)
        # Always hand images back as f32: under a bf16 compute dtype the
        # raw output is bf16, and host-side NumPy reductions over bf16
        # arrays accumulate IN bf16 — a mean over ~1e5 pixels silently
        # saturates to ~0 (ml_dtypes keeps the dtype through np.asarray).
        return out["img"].astype(jnp.float32)

    return sample
