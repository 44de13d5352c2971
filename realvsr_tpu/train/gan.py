"""GAN-Split training step (rebuild of
``codes/models/VideoSRGAN_AllPair_model_YCbCr_Split.py``).

Losses on the Y-channel Laplacian pyramid: structure loss on the LF base,
detail loss on HF levels 0..1, color loss on CbCr, optional VGG feature on
the LF base, and gan/ragan adversarial terms on the HF levels through a
multiscale discriminator (list-input v3/v4 style).  Two optimizers (G, D);
G updates are gated by D_update_ratio / D_init_iters via lax.cond (the
reference skips optimizer_G.step() on gated iterations).
"""
from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax

from realvsr_tpu.data.augments import apply_augment
from realvsr_tpu.losses import (charbonnier_loss, gan_loss, gw_loss, huber_loss,
                                l1_loss, l2_loss, ssim_loss)
from realvsr_tpu.ops.pyramid import laplacian_pyramid
from realvsr_tpu.schedules import build_lr_schedule

_CRITERIA = {
    "l1": l1_loss,
    "l2": l2_loss,
    "cb": charbonnier_loss,
    "hb": huber_loss,
    "gw": lambda x, y: gw_loss(x, y, w=4.0),
    "ssim": lambda x, y: ssim_loss(x, y),
}


@flax.struct.dataclass
class GANTrainState:
    step: int
    params_g: Any
    params_d: Any
    opt_state_g: Any
    opt_state_d: Any
    apply_g: Callable = flax.struct.field(pytree_node=False)
    apply_d: Callable = flax.struct.field(pytree_node=False)
    tx_g: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    # BatchNorm running statistics (empty for BN-free G; discriminators
    # built from SimpleBlock carry them — discriminator_arch.py:13-40)
    batch_stats_g: Any = flax.core.FrozenDict()
    batch_stats_d: Any = flax.core.FrozenDict()


def _make_tx(train_opt: dict, which: str) -> optax.GradientTransformation:
    sched_opt = dict(train_opt)
    sched_opt["lr_G"] = train_opt[f"lr_{which}"]
    lr_fn = build_lr_schedule(sched_opt)
    beta1 = float(train_opt.get(f"beta1_{which}") or 0.9)
    beta2 = float(train_opt.get(f"beta2_{which}") or 0.99)
    wd = float(train_opt.get(f"weight_decay_{which}") or 0.0)
    schedule = lambda count: lr_fn(count + 1)
    if wd:
        return optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=wd)
    return optax.adam(schedule, b1=beta1, b2=beta2)


def create_gan_train_state(model_g, model_d, opt: dict, sample_lq, rng,
                           sample_d_input=None) -> GANTrainState:
    k1, k2 = jax.random.split(rng)
    vars_g = model_g.init(k1, sample_lq)
    if sample_d_input is None:
        b, t, h, w, c = sample_lq.shape
        y = jnp.zeros((b, h, w, 1), jnp.float32)
        pyr = laplacian_pyramid(y, max_levels=3)
        sample_d_input = pyr[:-1]
    vars_d = model_d.init(k2, sample_d_input)
    params_g, params_d = vars_g["params"], vars_d["params"]
    tx_g = _make_tx(opt["train"], "G")
    tx_d = _make_tx(opt["train"], "D")
    return GANTrainState(
        step=0,
        params_g=params_g,
        params_d=params_d,
        opt_state_g=tx_g.init(params_g),
        opt_state_d=tx_d.init(params_d),
        apply_g=model_g.apply,
        apply_d=model_d.apply,
        tx_g=tx_g,
        tx_d=tx_d,
        batch_stats_g=vars_g.get("batch_stats", flax.core.FrozenDict()),
        batch_stats_d=vars_d.get("batch_stats", flax.core.FrozenDict()),
    )


def make_gan_split_train_step(model_g, opt: dict,
                              feature_apply: Callable | None = None) -> Callable:
    train_opt = opt["train"]
    w_s = float(train_opt.get("pixel_weight_s") or 0.0)
    w_d = float(train_opt.get("pixel_weight_d") or 0.0)
    w_c = float(train_opt.get("pixel_weight_c") or 0.0)
    w_fea = float(train_opt.get("feature_weight") or 0.0)
    w_gan = float(train_opt.get("gan_weight") or 1e-4)
    cri_s = _CRITERIA[train_opt["pixel_criterion_s"]] if w_s > 0 else None
    cri_d = _CRITERIA[train_opt["pixel_criterion_d"]] if w_d > 0 else None
    cri_c = _CRITERIA[train_opt["pixel_criterion_c"]] if w_c > 0 else None
    cri_fea = _CRITERIA[train_opt["feature_criterion"]] if (
        w_fea > 0 and train_opt.get("feature_criterion")) else None
    gan_type = train_opt.get("gan_type") or "gan"
    d_update_ratio = int(train_opt.get("D_update_ratio") or 1)
    d_init_iters = int(train_opt.get("D_init_iters") or 0)
    sg = jax.lax.stop_gradient

    def cri_gan(logits, is_real):
        base = "gan" if gan_type == "ragan" else gan_type
        return gan_loss(logits, is_real, gan_type=base)

    def train_step(state: GANTrainState, batch, rng):
        gt, lq = batch["GT"], batch["LQs"]
        ref = batch.get("ref", gt)
        aug = opt.get("augment")
        if aug:
            gt, lq = apply_augment(rng, gt, lq, aug["augs"], aug["probs"],
                                   aug["alphas"], aug["mix_p"])
        ctr = lq.shape[1] // 2
        real = gt[:, ctr]
        real_ref = ref[:, ctr]
        real_y = real[..., 0:1]
        real_c = real[..., 1:3]
        real_y_pyr = laplacian_pyramid(real_y, max_levels=3)
        real_ref_y_pyr = laplacian_pyramid(real_ref[..., 0:1], max_levels=3)

        step_i = state.step + 1  # reference step counting starts at 1
        g_active = jnp.logical_and(step_i % d_update_ratio == 0,
                                   step_i > d_init_iters)

        def apply_d_ro(params_d, x):
            """D forward reading (not updating) running stats."""
            v = {"params": params_d}
            if state.batch_stats_d:
                v["batch_stats"] = state.batch_stats_d
            return state.apply_d(v, x, train=True)

        # ------------------------- G step -------------------------
        def g_loss_fn(params_g):
            if state.batch_stats_g:
                fake, mut_g = state.apply_g(
                    {"params": params_g, "batch_stats": state.batch_stats_g},
                    lq, train=True, mutable=["batch_stats"])
                new_bs_g = mut_g["batch_stats"]
            else:
                fake = state.apply_g({"params": params_g}, lq, train=True)
                new_bs_g = state.batch_stats_g
            fake_y = fake[..., 0:1]
            fake_c = fake[..., 1:3]
            fake_y_pyr = laplacian_pyramid(fake_y, max_levels=3)
            logs = {}
            total = 0.0
            if cri_s:
                l = w_s * cri_s(fake_y_pyr[-1], real_y_pyr[-1])
                logs["l_g_pix_s"] = l
                total += l
            if cri_d:
                l = w_d * cri_d(fake_y_pyr[0], real_y_pyr[0]) + \
                    w_d * cri_d(fake_y_pyr[1], real_y_pyr[1])
                logs["l_g_pix_d"] = l
                total += l
            if cri_c:
                l = w_c * cri_c(fake_c, real_c)
                logs["l_g_pix_c"] = l
                total += l
            if cri_fea:
                real_fea = sg(feature_apply(real_y_pyr[-1]))
                fake_fea = feature_apply(fake_y_pyr[-1])
                l = w_fea * cri_fea(fake_fea, real_fea)
                logs["l_g_fea"] = l
                total += l
            # adversarial term
            if gan_type == "gan":
                pred_fake = apply_d_ro(state.params_d, fake_y_pyr[:-1])
                l_gan = sum(w_gan * cri_gan(p, True) for p in pred_fake)
            else:  # ragan
                pred_real = [sg(p) for p in apply_d_ro(
                    state.params_d, real_ref_y_pyr[:-1])]
                pred_fake = apply_d_ro(state.params_d, fake_y_pyr[:-1])
                l_gan = sum(
                    w_gan * (cri_gan(pr - jnp.mean(pf), False) +
                             cri_gan(pf - jnp.mean(pr), True)) / 2.0
                    for pr, pf in zip(pred_real, pred_fake))
            logs["l_g_gan"] = l_gan
            total += l_gan
            logs["l_g_total"] = total
            return total, (logs, fake_y_pyr, new_bs_g)

        (l_g, (g_logs, fake_y_pyr, new_bs_g)), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_g)

        def apply_g_update(args):
            params_g, opt_g = args
            updates, opt_g = state.tx_g.update(grads_g, opt_g, params_g)
            return optax.apply_updates(params_g, updates), opt_g

        params_g, opt_state_g = jax.lax.cond(
            g_active, apply_g_update, lambda a: a,
            (state.params_g, state.opt_state_g))

        # ------------------------- D step -------------------------
        fake_y_pyr_sg = [sg(p) for p in fake_y_pyr[:-1]]

        def d_loss_fn(params_d):
            # sequential running-stat updates like torch's train-mode D:
            # real forward first, fake forward sees the updated stats
            if state.batch_stats_d:
                pred_real, mut1 = state.apply_d(
                    {"params": params_d, "batch_stats": state.batch_stats_d},
                    real_ref_y_pyr[:-1], train=True, mutable=["batch_stats"])
                pred_fake, mut2 = state.apply_d(
                    {"params": params_d, "batch_stats": mut1["batch_stats"]},
                    fake_y_pyr_sg, train=True, mutable=["batch_stats"])
                new_bs_d = mut2["batch_stats"]
            else:
                pred_real = state.apply_d({"params": params_d},
                                          real_ref_y_pyr[:-1], train=True)
                pred_fake = state.apply_d({"params": params_d}, fake_y_pyr_sg,
                                          train=True)
                new_bs_d = state.batch_stats_d
            if gan_type == "gan":
                l_real = sum(cri_gan(p, True) for p in pred_real)
                l_fake = sum(cri_gan(p, False) for p in pred_fake)
            else:
                l_real = sum(
                    cri_gan(pr - sg(jnp.mean(pf)), True) * 0.5
                    for pr, pf in zip(pred_real, pred_fake))
                l_fake = sum(
                    cri_gan(pf - sg(jnp.mean(pr)), False) * 0.5
                    for pr, pf in zip(pred_real, pred_fake))
            return l_real + l_fake, ({"l_d_real": l_real,
                                      "l_d_fake": l_fake}, new_bs_d)

        (l_d, (d_logs, new_bs_d)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_d)
        updates_d, opt_state_d = state.tx_d.update(grads_d, state.opt_state_d,
                                                   state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        logs = {**g_logs, **d_logs, "g_active": g_active.astype(jnp.float32)}
        new_state = state.replace(step=state.step + 1, params_g=params_g,
                                  params_d=params_d, opt_state_g=opt_state_g,
                                  opt_state_d=opt_state_d,
                                  batch_stats_g=new_bs_g,
                                  batch_stats_d=new_bs_d)
        return new_state, logs

    return train_step
