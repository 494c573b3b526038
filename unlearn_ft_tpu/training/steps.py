"""Pure jitted training steps.

Each trainer in the reference is a Python loop over a torch step method with
DDP allreduce at backward (trainer.py:2403-2488 fine-tune, :2904-3001 upper,
:1159-1321 pruning). Here every step is ONE pure function — VAE encode,
forward processes, teacher+student forwards, losses, and the optax update all
inside a single XLA graph — jitted once and sharded over the DP mesh; the
gradient mean over devices is the psum XLA inserts for the replicated-param /
sharded-batch layout.

NaN protection replaces the reference's host-side NaN-batch skipping
(trainer.py:986-994) with a where() on the update, so it costs nothing.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import (
    block_distillation_loss,
    contrastive_loss,
    diffusion_loss,
    distillation_loss,
    esd_negative_guidance_target,
    resource_loss,
)
from ..schedulers import DiffusionSchedule
from ..utils import macs as macs_lib
from ..utils.arch import GateLayout


@dataclass(frozen=True)
class LossConfig:
    snr_gamma: Optional[float] = 5.0
    diffusion_weight: float = 1.0
    distillation_weight: float = 2.0
    block_weight: float = 0.1
    # bilevel upper step (configs/baselines/*bilevel.yaml)
    upper_distillation_weight: float = 1.0
    upper_block_weight: float = 0.0
    # pruning stage
    contrastive_weight: float = 10.0
    resource_weight: float = 2.0
    resource_target: float = 0.7
    resource_type: str = "log"
    std_weight: float = 0.0
    max_weight: float = 0.0
    noise_offset: float = 0.0
    input_perturbation: float = 0.0
    max_scheduler_steps: Optional[int] = None


def _forward_process(sched: DiffusionSchedule, loss_cfg: LossConfig, latents, rng):
    k_noise, k_offset, k_perturb, k_t = jax.random.split(rng, 4)
    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    if loss_cfg.noise_offset:
        b, _, _, c = latents.shape
        noise = noise + loss_cfg.noise_offset * jax.random.normal(
            k_offset, (b, 1, 1, c), latents.dtype
        )
    used_noise = noise
    if loss_cfg.input_perturbation:
        used_noise = noise + loss_cfg.input_perturbation * jax.random.normal(
            k_perturb, noise.shape, noise.dtype
        )
    t_max = loss_cfg.max_scheduler_steps or sched.num_train_timesteps
    timesteps = jax.random.randint(k_t, (latents.shape[0],), 0, t_max)
    noisy = sched.add_noise(latents, used_noise, timesteps)
    target = sched.training_target(latents, noise, timesteps)
    return noisy, timesteps, target


def _get_latents(vae, vae_params, batch, rng):
    """Latents from (in order of preference): precomputed 'latents',
    precomputed 'latent_moments' (mean/logvar -> fresh sample each step —
    bit-identical training distribution to in-loop VAE encode at ~1/7 of the
    step FLOPs; the VAE encoder costs more than the teacher U-Net at 512px),
    or in-loop VAE encode of 'pixel_values' (the reference's hot path)."""
    if "latents" in batch:
        return batch["latents"]
    if "latent_moments" in batch:
        mean, logvar = jnp.split(batch["latent_moments"], 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return (z - vae.cfg.shift_factor) * vae.cfg.scaling_factor
    return jax.lax.stop_gradient(
        vae.apply({"params": vae_params}, batch["pixel_values"], rng, method=vae.encode)
    )


def _safe_update(tx, grads, opt_state, params, loss):
    """Apply the optimizer update only when the loss is finite."""
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    good = jnp.isfinite(loss)
    pick = lambda new, old: jax.tree.map(lambda n, o: jnp.where(good, n, o), new, old)
    return pick(new_params, params), pick(new_opt_state, opt_state)


def _merge_accum_metrics(metrics):
    """Collapse the [accum, ...] leading axis left by the microbatch scan:
    scalars average (a NaN microbatch keeps the NaN so _safe_update still
    skips), per-sample arrays concatenate back to the effective batch."""
    return jax.tree.map(
        lambda m: m.mean(0) if m.ndim <= 1 else m.reshape((-1,) + m.shape[2:]),
        metrics,
    )


def _accumulated_grads(grad_fn, accum, params, frozen, batch, rng):
    """Gradient accumulation inside the jitted step (reference: accelerate's
    ``gradient_accumulation_steps``, trainer.py:124,983). ``batch`` leaves
    carry a leading [accum, ...] microbatch axis; a lax.scan runs the
    backward per microbatch so activation memory stays at microbatch size,
    and only the (param-sized) gradient accumulator is extra HBM. Returns
    (mean loss, mean grads, merged metrics)."""
    keys = jax.random.split(rng, accum)

    def body(acc, xs):
        micro, key = xs
        loss, grads, metrics = grad_fn(params, frozen, micro, key)
        return jax.tree.map(jnp.add, acc, grads), (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype), params)
    acc, (losses, metrics) = jax.lax.scan(body, zeros, (batch, keys))
    grads = jax.tree.map(lambda g: g / accum, acc)
    return losses.mean(), grads, _merge_accum_metrics(metrics)


# ---------------------------------------------------------------------------
# Expert fine-tuning (UnetFineTuner.step, trainer.py:2403-2488)
# ---------------------------------------------------------------------------

def _finetune_core(
    student,
    teacher,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    grad_accum: int = 1,
):
    """Unjitted lower-step body; make_finetune_step jits it, and the fused
    cadence step scans it. With ``grad_accum > 1`` the batch leaves carry a
    leading [accum, ...] microbatch axis and ONE optimizer update applies the
    mean gradient (reference: accelerate accumulate, trainer.py:983)."""
    need_teacher = loss_cfg.distillation_weight > 0 or loss_cfg.block_weight > 0
    need_acts = loss_cfg.block_weight > 0  # don't build the activation taps
    # into the graph when the block loss is off — the sow outputs would
    # otherwise rely on XLA DCE to stay free

    def grad_fn(params, frozen, batch, rng):
        k_vae, k_fwd = jax.random.split(rng)
        latents = _get_latents(vae, frozen["vae"], batch, k_vae)
        noisy, timesteps, target = _forward_process(sched, loss_cfg, latents, k_fwd)
        ctx = batch["prompt_embeds"]

        if need_teacher:
            out = teacher.apply(
                {"params": frozen["teacher"]}, noisy, timesteps, ctx,
                return_block_activations=need_acts,
            )
            teacher_pred, teacher_acts = out if need_acts else (out, None)
            teacher_pred = jax.lax.stop_gradient(teacher_pred)
            teacher_acts = jax.lax.stop_gradient(teacher_acts)

        def loss_fn(p):
            out = student.apply(
                {"params": p}, noisy, timesteps, ctx,
                return_block_activations=need_acts,
            )
            pred, acts = out if need_acts else (out, None)
            d_loss = diffusion_loss(
                pred, target, timesteps, sched.alphas_cumprod, loss_cfg.snr_gamma,
                sched.prediction_type,
            )
            loss = loss_cfg.diffusion_weight * d_loss
            dist = jnp.asarray(0.0)
            blk = jnp.asarray(0.0)
            if loss_cfg.distillation_weight > 0:
                dist = distillation_loss(pred, teacher_pred)
                loss = loss + loss_cfg.distillation_weight * dist
            if loss_cfg.block_weight > 0:
                blk = block_distillation_loss(acts, teacher_acts)
                loss = loss + loss_cfg.block_weight * blk
            return loss, {"loss": loss, "diff_loss": d_loss, "distill_loss": dist,
                          "block_loss": blk}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, metrics

    def step(params, opt_state, frozen, batch, rng):
        if grad_accum > 1:
            loss, grads, metrics = _accumulated_grads(
                grad_fn, grad_accum, params, frozen, batch, rng
            )
        else:
            loss, grads, metrics = grad_fn(params, frozen, batch, rng)
        new_params, new_opt_state = _safe_update(tx, grads, opt_state, params, loss)
        return new_params, new_opt_state, metrics

    return step


def _with_packed_frozen(core, frozen_spec):
    """Wrap a ``step(params, opt_state, frozen, batch, rng)`` core so it
    accepts the frozen towers as packed flat buffers (utils/packing.py),
    unpacked at program entry. Unlike full packed dispatch
    (make_packed_step), the trainable param/opt trees keep their donated
    per-leaf boundary — the frozen trees are read-only, so there is no
    repack write-back, and this only removes their ~900 buffers of
    per-dispatch bookkeeping."""
    if frozen_spec is None:
        return core
    from ..utils.packing import unpack

    def step(params, opt_state, flat_frozen, batch, rng):
        return core(params, opt_state, unpack(flat_frozen, frozen_spec), batch, rng)

    return step


def make_finetune_step(
    student,
    teacher,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    grad_accum: int = 1,
    frozen_spec=None,
):
    """Returns step(params, opt_state, frozen, batch, rng) -> (params,
    opt_state, metrics). ``frozen`` = {'teacher':…, 'vae':…} param trees,
    or packed flat buffers when ``frozen_spec`` is given (see
    _with_packed_frozen)."""
    return partial(jax.jit, donate_argnums=(0, 1))(_with_packed_frozen(
        _finetune_core(student, teacher, vae, sched, loss_cfg, tx, grad_accum),
        frozen_spec,
    ))


# ---------------------------------------------------------------------------
# Bilevel upper step: ESD negative-guidance suppression
# (BilevelUnetFineTuner.upper_step, trainer.py:2904-3001)
# ---------------------------------------------------------------------------

def _upper_core(
    student,
    teacher,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    upper_tx: optax.GradientTransformation,
    grad_accum: int = 1,
):
    need_acts = loss_cfg.upper_block_weight > 0

    def grad_fn(params, frozen, batch, rng):
        k_vae, k_fwd = jax.random.split(rng)
        latents = _get_latents(vae, frozen["vae"], batch, k_vae)
        noisy, timesteps, _ = _forward_process(sched, loss_cfg, latents, k_fwd)
        ctx = batch["prompt_embeds"]
        empty_ctx = batch["empty_prompt_embeds"]
        b = noisy.shape[0]

        # ONE teacher dispatch at 2B ([cond; uncond] CFG-style concat) —
        # two separate full forwards left ~2x teacher launch/pipeline cost
        # on the table for a step that is 1/10 of the training mix
        noisy2 = jnp.concatenate([noisy, noisy], axis=0)
        t2 = jnp.concatenate([timesteps, timesteps], axis=0)
        ctx2 = jnp.concatenate([ctx, empty_ctx], axis=0)
        out = teacher.apply(
            {"params": frozen["teacher"]}, noisy2, t2, ctx2,
            return_block_activations=need_acts,
        )
        both, acts2 = out if need_acts else (out, None)
        teacher_cond, teacher_uncond = jnp.split(both, 2, axis=0)
        # block loss compares against the conditional half's activations
        teacher_acts = (
            jax.tree.map(lambda a: a[:b], acts2) if need_acts else None
        )
        esd_target = esd_negative_guidance_target(teacher_cond, teacher_uncond)
        teacher_acts = jax.lax.stop_gradient(teacher_acts)

        def loss_fn(p):
            out_s = student.apply(
                {"params": p}, noisy, timesteps, ctx,
                return_block_activations=need_acts,
            )
            pred, acts = out_s if need_acts else (out_s, None)
            loss = jnp.asarray(0.0)
            dist = jnp.asarray(0.0)
            blk = jnp.asarray(0.0)
            if loss_cfg.upper_distillation_weight > 0:
                dist = jnp.mean((pred - esd_target) ** 2)
                loss = loss + loss_cfg.upper_distillation_weight * dist
            if loss_cfg.upper_block_weight > 0:
                blk = block_distillation_loss(acts, teacher_acts)
                loss = loss + loss_cfg.upper_block_weight * blk
            return loss, {"upper_loss": loss, "upper_distill_loss": dist,
                          "upper_block_loss": blk}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, metrics

    def step(params, upper_opt_state, frozen, batch, rng):
        if grad_accum > 1:
            loss, grads, metrics = _accumulated_grads(
                grad_fn, grad_accum, params, frozen, batch, rng
            )
        else:
            loss, grads, metrics = grad_fn(params, frozen, batch, rng)
        new_params, new_opt_state = _safe_update(
            upper_tx, grads, upper_opt_state, params, loss
        )
        return new_params, new_opt_state, metrics

    return step


def make_upper_step(
    student,
    teacher,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    upper_tx: optax.GradientTransformation,
    grad_accum: int = 1,
    frozen_spec=None,
):
    return partial(jax.jit, donate_argnums=(0, 1))(_with_packed_frozen(
        _upper_core(student, teacher, vae, sched, loss_cfg, upper_tx, grad_accum),
        frozen_spec,
    ))


# ---------------------------------------------------------------------------
# Packed-dispatch variants: the step boundary carries thousands of leaf
# buffers (~700 student params + ~900 optimizer states + ~900 frozen tower
# leaves) and the runtime pays ~9us of per-buffer bookkeeping per dispatch —
# a measured ~76ms/step host gap on the v5e tunnel at batch 8 x accum 2.
# These wrap the SAME cores over a handful of flat per-dtype buffers
# (utils/packing.py); numerics are identical (tests/test_packing.py).
# ---------------------------------------------------------------------------

def make_packed_finetune_step(
    student, teacher, vae, sched, loss_cfg, tx,
    param_spec, opt_spec, frozen_spec, grad_accum: int = 1,
):
    """Packed make_finetune_step: step(flat_params, flat_opt, flat_frozen,
    batch, rng) -> (flat_params, flat_opt, metrics). Build the specs with
    utils.packing.make_pack_spec on the host trees."""
    from ..utils.packing import make_packed_step

    return make_packed_step(
        _finetune_core(student, teacher, vae, sched, loss_cfg, tx, grad_accum),
        param_spec, opt_spec, frozen_spec,
    )


def make_packed_upper_step(
    student, teacher, vae, sched, loss_cfg, upper_tx,
    param_spec, opt_spec, frozen_spec, grad_accum: int = 1,
):
    """Packed make_upper_step (same flat-buffer boundary)."""
    from ..utils.packing import make_packed_step

    return make_packed_step(
        _upper_core(student, teacher, vae, sched, loss_cfg, upper_tx, grad_accum),
        param_spec, opt_spec, frozen_spec,
    )


# ---------------------------------------------------------------------------
# Fused bilevel cadence: the reference interleaves one ESD upper step after
# every upper_step_freq lower steps on the host (trainer.py:2793-2816). Here
# the WHOLE cadence is one XLA program — lax.scan over the lower steps, then
# the upper step — so the device sees one dispatch per cadence instead of
# eleven. On the single-chip bench the per-dispatch host gap was ~26ms/step
# (device busy 185.7ms vs 212.3ms wall at 512px b8), i.e. ~12% idle that
# this removes.
# ---------------------------------------------------------------------------

def make_bilevel_cadence_step(
    student,
    teacher,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    upper_tx: optax.GradientTransformation,
    lower_per_upper: int = 10,
    grad_accum: int = 1,
):
    """Returns step(params, opt_state, upper_opt_state, frozen,
    lower_batches, upper_batch, rng) -> (params, opt_state, upper_opt_state,
    lower_metrics, upper_metrics).

    ``lower_batches`` is the usual lower batch dict with every leaf stacked
    to a [lower_per_upper, ...] leading axis (one slice per lower step);
    ``lower_metrics`` leaves carry the same leading axis. With grad_accum > 1
    each slice additionally carries the [accum, ...] microbatch axis.
    """
    lower = _finetune_core(student, teacher, vae, sched, loss_cfg, tx, grad_accum)
    upper = _upper_core(student, teacher, vae, sched, loss_cfg, upper_tx, grad_accum)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, upper_opt_state, frozen, lower_batches, upper_batch, rng):
        keys = jax.random.split(rng, lower_per_upper + 1)

        def body(carry, xs):
            p, o = carry
            batch, key = xs
            p, o, m = lower(p, o, frozen, batch, key)
            return (p, o), m

        (params, opt_state), lower_metrics = jax.lax.scan(
            body, (params, opt_state), (lower_batches, keys[:-1])
        )
        params, upper_opt_state, upper_metrics = upper(
            params, upper_opt_state, frozen, upper_batch, keys[-1]
        )
        return params, opt_state, upper_opt_state, lower_metrics, upper_metrics

    return step


# ---------------------------------------------------------------------------
# DreamBooth upper step (DreamBoothBilevelUnetFineTuner.upper_step,
# trainer.py:3314-3398): plain DDPM objective on paired instance/class
# batches; with prior preservation the batch is [instance | prior] halves and
# loss = mse(instance) + prior_loss_weight * mse(prior).
# ---------------------------------------------------------------------------

def _dreambooth_core(
    student,
    vae,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    upper_tx: optax.GradientTransformation,
    prior_loss_weight: float = 1.0,
    with_prior_preservation: bool = True,
    grad_accum: int = 1,
):
    """NOTE (deliberate deviation): for v-prediction the reference passes
    ``noisy_latents`` to get_velocity (trainer.py:3373) — a known HF-script
    quirk; here the target comes from ``sched.training_target(latents, …)``,
    the correct velocity."""

    def grad_fn(params, frozen, batch, rng):
        k_vae, k_fwd = jax.random.split(rng)
        latents = _get_latents(vae, frozen["vae"], batch, k_vae)
        noisy, timesteps, target = _forward_process(sched, loss_cfg, latents, k_fwd)
        ctx = batch["prompt_embeds"]

        def loss_fn(p):
            pred = student.apply({"params": p}, noisy, timesteps, ctx)
            se = ((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
            per_row = se.reshape(se.shape[0], -1).mean(axis=1)
            if with_prior_preservation:
                inst, prior = jnp.split(per_row, 2, axis=0)
                inst_loss = inst.mean()
                prior_loss = prior.mean()
                loss = inst_loss + prior_loss_weight * prior_loss
            else:
                inst_loss = per_row.mean()
                prior_loss = jnp.asarray(0.0)
                loss = inst_loss
            return loss, {"upper_loss": loss, "instance_loss": inst_loss,
                          "prior_loss": prior_loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, metrics

    def step(params, upper_opt_state, frozen, batch, rng):
        if grad_accum > 1:
            loss, grads, metrics = _accumulated_grads(
                grad_fn, grad_accum, params, frozen, batch, rng
            )
        else:
            loss, grads, metrics = grad_fn(params, frozen, batch, rng)
        new_params, new_opt_state = _safe_update(
            upper_tx, grads, upper_opt_state, params, loss
        )
        return new_params, new_opt_state, metrics

    return step


def make_dreambooth_upper_step(*args, **kwargs):
    return partial(jax.jit, donate_argnums=(0, 1))(_dreambooth_core(*args, **kwargs))


def make_packed_dreambooth_upper_step(
    student, vae, sched, loss_cfg, upper_tx,
    param_spec, opt_spec, frozen_spec,
    prior_loss_weight: float = 1.0,
    with_prior_preservation: bool = True,
    grad_accum: int = 1,
):
    """Packed-boundary DreamBooth upper step (see make_packed_finetune_step)."""
    from ..utils.packing import make_packed_step

    return make_packed_step(
        _dreambooth_core(student, vae, sched, loss_cfg, upper_tx,
                         prior_loss_weight, with_prior_preservation, grad_accum),
        param_spec, opt_spec, frozen_spec,
    )


# ---------------------------------------------------------------------------
# Flux pruning step (FluxPruner.step, trainer.py:1742-1940): flow-matching
# loss + contrastive + resource; no distill/block terms (disabled upstream).
# ---------------------------------------------------------------------------

def compute_density_for_timestep_sampling(
    key, weighting_scheme: str, batch: int, logit_mean=0.0, logit_std=1.0, mode_scale=1.29
):
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(key, (batch,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    return jax.random.uniform(key, (batch,))


def compute_loss_weighting_for_sd3(weighting_scheme: str, sigmas):
    if weighting_scheme == "sigma_sqrt":
        return (sigmas**-2.0).astype(jnp.float32)
    if weighting_scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas**2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


def _flux_pruner_loss_fn(
    flux, hypernet, quantizer_cfg, layout, flux_cfg, fm_sched, loss_cfg,
    l_img, l_txt, weighting_scheme, guidance_scale, pretrain, macs_table,
):
    """Shared Flux pruning loss surface (train + validation; the eval path
    passes training=False so the quantizer hard-assigns from embedding_gs)."""
    from ..utils import flux_macs as fm

    full_cur = fm.flux_calc_macs(
        flux_cfg, layout, layout.ones(1), l_img, l_txt, macs_table
    )["cur_prunable"][0]

    def loss_for(p, quant_state, frozen, batch, rng, training):
        k_noise, k_u, k_q, k_gs = jax.random.split(rng, 4)
        latents = batch["latents"]  # packed [B, l_img, C]
        b = latents.shape[0]
        noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        u = compute_density_for_timestep_sampling(k_u, weighting_scheme, b)
        indices = jnp.clip(
            (u * fm_sched.num_train_timesteps).astype(jnp.int32), 0,
            fm_sched.num_train_timesteps - 1,
        )
        sigmas = fm_sched.sigmas[indices]
        noisy = fm_sched.scale_noise(latents, noise, sigmas)
        timesteps = fm_sched.timesteps[indices] / 1000.0
        guidance = (
            jnp.full((b,), guidance_scale) if guidance_scale is not None else None
        )
        mpnet_emb = batch["mpnet_embeddings"]

        arch_logits = hypernet.apply({"params": p["hypernet"]}, mpnet_emb)
        zq, idx, new_qstate = quantizer_cfg(
            k_q, p["quantizer"], quant_state, arch_logits, training=training
        )
        arch_gs = quantizer_cfg.gumbel_sigmoid_trick(k_gs, arch_logits)
        arch_norm = quantizer_cfg.width_depth_normalize(quant_state, arch_gs)
        c_loss, _ = contrastive_loss(mpnet_emb, arch_norm)

        structure = layout.split(arch_gs if pretrain else zq)
        pred = flux.apply(
            {"params": frozen["flux"]}, noisy, batch["prompt_embeds"],
            batch["pooled_prompt_embeds"], timesteps, batch["img_ids"],
            batch["txt_ids"], guidance, structure,
        )
        target = noise - latents
        weighting = compute_loss_weighting_for_sd3(weighting_scheme, sigmas)[:, None, None]
        fm_loss = jnp.mean(
            (weighting * (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
            .reshape(b, -1).mean(axis=1)
        )

        macs_dict = fm.flux_calc_macs(flux_cfg, layout, structure, l_img, l_txt, macs_table)
        ratios = macs_dict["cur_prunable"] / full_cur
        r_loss = resource_loss(ratios.mean(), loss_cfg.resource_target,
                               loss_cfg.resource_type)
        loss = (
            loss_cfg.diffusion_weight * fm_loss
            + loss_cfg.resource_weight * r_loss
            + loss_cfg.contrastive_weight * c_loss
        )
        metrics = {"loss": loss, "diff_loss": fm_loss, "contrastive_loss": c_loss,
                   "resource_loss": r_loss, "resource_ratio": ratios.mean(),
                   "expert_indices": idx}
        return loss, (metrics, new_qstate)

    return loss_for


def make_flux_pruner_eval_step(
    flux,
    hypernet,
    quantizer_cfg,
    layout: GateLayout,
    flux_cfg,
    fm_sched,
    loss_cfg: LossConfig,
    l_img: int,
    l_txt: int,
    weighting_scheme: str = "logit_normal",
    guidance_scale: Optional[float] = None,
    pretrain: bool = False,
):
    """Flux validation losses (reference FluxPruner inherits
    UnetPruner.validate, trainer.py:1093-1147)."""
    from ..utils import flux_macs as fm

    macs_table = fm.flux_macs(flux_cfg, l_img, l_txt)
    loss_for = _flux_pruner_loss_fn(
        flux, hypernet, quantizer_cfg, layout, flux_cfg, fm_sched, loss_cfg,
        l_img, l_txt, weighting_scheme, guidance_scale, pretrain, macs_table,
    )

    @jax.jit
    def eval_step(trainable, quant_state, frozen, batch, rng):
        _, (metrics, _) = loss_for(trainable, quant_state, frozen, batch, rng, False)
        return metrics

    return eval_step


def make_flux_pruner_step(
    flux,
    hypernet,
    quantizer_cfg,
    layout: GateLayout,
    flux_cfg,
    fm_sched,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    l_img: int,
    l_txt: int,
    weighting_scheme: str = "logit_normal",
    guidance_scale: Optional[float] = None,
    pretrain: bool = False,
    grad_accum: int = 1,
):
    """Batch: packed 'latents' [B, l_img, in_channels] (or raw via VAE done
    host-side), 'prompt_embeds' [B, l_txt, joint_dim], 'pooled_prompt_embeds',
    'img_ids', 'txt_ids', 'mpnet_embeddings'."""
    from ..utils import flux_macs as fm

    macs_table = fm.flux_macs(flux_cfg, l_img, l_txt)
    loss_for = _flux_pruner_loss_fn(
        flux, hypernet, quantizer_cfg, layout, flux_cfg, fm_sched, loss_cfg,
        l_img, l_txt, weighting_scheme, guidance_scale, pretrain, macs_table,
    )

    def grad_fn(trainable, quant_state, frozen, batch, rng):
        (loss, (metrics, new_qstate)), grads = jax.value_and_grad(
            loss_for, has_aux=True
        )(trainable, quant_state, frozen, batch, rng, True)
        return loss, grads, metrics, new_qstate

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(trainable, opt_state, quant_state, frozen, batch, rng):
        if grad_accum > 1:
            loss, grads, metrics, new_qstate = _accumulated_pruner_grads(
                grad_fn, grad_accum, trainable, quant_state, frozen, batch, rng
            )
        else:
            loss, grads, metrics, new_qstate = grad_fn(
                trainable, quant_state, frozen, batch, rng
            )
        new_trainable, new_opt_state = _safe_update(tx, grads, opt_state, trainable, loss)
        return new_trainable, new_opt_state, new_qstate, metrics

    return step


def _accumulated_pruner_grads(grad_fn, accum, trainable, quant_state, frozen, batch, rng):
    """Pruner-step accumulation: like _accumulated_grads, but the quantizer
    state (Sinkhorn codebook EMA) threads sequentially through the
    microbatches — the same per-microbatch update order the reference's
    accumulate context produces (trainer.py:983,1197)."""
    keys = jax.random.split(rng, accum)

    def body(carry, xs):
        acc, qstate = carry
        micro, key = xs
        loss, grads, metrics, new_qstate = grad_fn(trainable, qstate, frozen, micro, key)
        return (jax.tree.map(jnp.add, acc, grads), new_qstate), (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype), trainable)
    (acc, qstate), (losses, metrics) = jax.lax.scan(
        body, (zeros, quant_state), (batch, keys)
    )
    grads = jax.tree.map(lambda g: g / accum, acc)
    return losses.mean(), grads, _merge_accum_metrics(metrics), qstate


# ---------------------------------------------------------------------------
# APTP pruning step (UnetPruner.step, trainer.py:1159-1321)
# ---------------------------------------------------------------------------

def _pruner_loss_fn(
    unet, hypernet, quantizer_cfg, vae, layout, spec, sched, loss_cfg,
    seq_kv, pretrain, macs_table,
):
    """Shared loss surface of the pruning stage: the train step
    differentiates it (make_pruner_step), validation evaluates it with
    ``training=False`` (make_pruner_eval_step — the quantizer then takes
    its eval hard-assignment path and leaves the codebook state alone)."""

    def loss_for(p, quant_state, frozen, batch, rng, training):
        k_vae, k_fwd, k_q, k_gs = jax.random.split(rng, 4)
        latents = _get_latents(vae, frozen["vae"], batch, k_vae)
        noisy, timesteps, target = _forward_process(sched, loss_cfg, latents, k_fwd)
        ctx = batch["prompt_embeds"]
        mpnet_emb = batch["mpnet_embeddings"]
        batch_size = latents.shape[0]

        ones = layout.ones(batch_size)
        teacher_pred, teacher_acts = unet.apply(
            {"params": frozen["unet"]}, noisy, timesteps, ctx, ones,
            return_block_activations=True,
        )
        teacher_pred = jax.lax.stop_gradient(teacher_pred)
        teacher_acts = jax.lax.stop_gradient(teacher_acts)

        # full-structure denominator for resource ratios (count_macs,
        # trainer.py:1344-1363)
        full_cur_prunable = macs_lib.calc_macs(spec, ones, seq_kv, macs_table)[
            "cur_prunable"][0]

        arch_logits = hypernet.apply({"params": p["hypernet"]}, mpnet_emb)
        zq, idx, new_qstate = quantizer_cfg(
            k_q, p["quantizer"], quant_state, arch_logits, training=training
        )
        arch_gs = quantizer_cfg.gumbel_sigmoid_trick(k_gs, arch_logits)
        arch_norm = quantizer_cfg.width_depth_normalize(quant_state, arch_gs)

        c_loss, sim = contrastive_loss(mpnet_emb, arch_norm)

        structure = layout.split(arch_gs if pretrain else zq)
        pred, acts = unet.apply(
            {"params": frozen["unet"]}, noisy, timesteps, ctx, structure,
            return_block_activations=True,
        )

        d_loss = diffusion_loss(
            pred, target, timesteps, sched.alphas_cumprod, loss_cfg.snr_gamma,
            sched.prediction_type,
        )
        dist = distillation_loss(pred, teacher_pred)
        blk = block_distillation_loss(acts, teacher_acts)

        macs_dict = macs_lib.calc_macs(spec, structure, seq_kv, macs_table)
        ratios = macs_dict["cur_prunable"] / full_cur_prunable
        r_loss = resource_loss(ratios.mean(), loss_cfg.resource_target,
                               loss_cfg.resource_type)
        std_loss = -jnp.std(ratios)
        max_loss = 1.0 - jnp.max(ratios)

        loss = (
            loss_cfg.diffusion_weight * d_loss
            + loss_cfg.resource_weight * r_loss
            + loss_cfg.contrastive_weight * c_loss
            + loss_cfg.distillation_weight * dist
            + loss_cfg.block_weight * blk
            + loss_cfg.std_weight * std_loss
            + loss_cfg.max_weight * max_loss
        )
        metrics = {
            "loss": loss, "diff_loss": d_loss, "distill_loss": dist,
            "block_loss": blk, "contrastive_loss": c_loss, "resource_loss": r_loss,
            "resource_ratio": ratios.mean(), "batch_resource_ratios": ratios,
            "expert_indices": idx,
        }
        return loss, (metrics, new_qstate)

    return loss_for


def make_pruner_eval_step(
    unet,
    hypernet,
    quantizer_cfg,
    vae,
    layout: GateLayout,
    spec,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    seq_kv: int = 77,
    pretrain: bool = False,
    frozen_spec=None,
):
    """Validation losses over the val split (reference UnetPruner.validate,
    trainer.py:1093-1147): the train step's full loss surface — diff /
    distill / block / contrastive / resource — with no gradients or updates
    and the quantizer's eval path (hard embedding_gs assignment). Returns
    the metrics dict."""
    macs_table = macs_lib.unet_macs(spec, seq_kv)
    loss_for = _pruner_loss_fn(
        unet, hypernet, quantizer_cfg, vae, layout, spec, sched, loss_cfg,
        seq_kv, pretrain, macs_table,
    )

    @jax.jit
    def eval_step(trainable, quant_state, frozen, batch, rng):
        if frozen_spec is not None:
            from ..utils.packing import unpack

            frozen = unpack(frozen, frozen_spec)
        _, (metrics, _) = loss_for(
            trainable, quant_state, frozen, batch, rng, training=False
        )
        return metrics

    return eval_step


def make_pruner_step(
    unet,
    hypernet,
    quantizer_cfg,
    vae,
    layout: GateLayout,
    spec,
    sched: DiffusionSchedule,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    seq_kv: int = 77,
    pretrain: bool = False,
    grad_accum: int = 1,
    frozen_spec=None,
):
    """Trainable = {'hypernet':…, 'quantizer':…}; U-Net frozen (gates only).
    The contrastive similarity, Sinkhorn sums and resource stats are global
    reductions over the sharded batch — DDP all_gathers fall out of jit.

    With grad_accum > 1 the contrastive/Sinkhorn batch is the microbatch, as
    in the reference's accumulate context (per-microbatch forward).

    ``frozen_spec`` (a utils.packing.PackSpec) makes the step accept the
    frozen {'unet':…,'vae':…} towers as packed flat buffers — the trainable
    trees are tiny, but the frozen gated U-Net is ~900 leaf buffers of
    per-dispatch bookkeeping (see make_packed_finetune_step)."""
    macs_table = macs_lib.unet_macs(spec, seq_kv)
    loss_for = _pruner_loss_fn(
        unet, hypernet, quantizer_cfg, vae, layout, spec, sched, loss_cfg,
        seq_kv, pretrain, macs_table,
    )

    def make_grad_fn(training):
        def grad_fn(trainable, quant_state, frozen, batch, rng):
            (loss, (metrics, new_qstate)), grads = jax.value_and_grad(
                loss_for, has_aux=True
            )(trainable, quant_state, frozen, batch, rng, training)
            return loss, grads, metrics, new_qstate

        return grad_fn

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("training",))
    def step(trainable, opt_state, quant_state, frozen, batch, rng, training=True):
        if frozen_spec is not None:
            from ..utils.packing import unpack

            frozen = unpack(frozen, frozen_spec)
        grad_fn = make_grad_fn(training)
        if grad_accum > 1:
            loss, grads, metrics, new_qstate = _accumulated_pruner_grads(
                grad_fn, grad_accum, trainable, quant_state, frozen, batch, rng
            )
        else:
            loss, grads, metrics, new_qstate = grad_fn(
                trainable, quant_state, frozen, batch, rng
            )
        new_trainable, new_opt_state = _safe_update(tx, grads, opt_state, trainable, loss)
        return new_trainable, new_opt_state, new_qstate, metrics

    return step
