"""ESD — Erased Stable Diffusion fine-tuning baseline.

Reference: baselines/erasing/esd_diffusers.py:23-114 (loss at :105) with the
FineTunedModel train-subset selection (noxattn / xattn / selfattn / full).
Training: partially denoise toward a sampled t with the *student*, then push
the student's conditional prediction toward the frozen model's
negative-guidance target  e_neutral - eta*(e_positive - e_neutral).

TPU-native shape: one jitted step; the trained subset is an optax.masked
partition of the same param tree (instead of module swapping).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..schedulers import DiffusionSchedule, ddim_step, ddim_timesteps


def esd_param_mask(params: Dict, method: str = "noxattn") -> Dict:
    """True = trainable. Methods mirror esd_diffusers.py train_method:
    - noxattn: everything except cross-attn (attn2) and time embedding
    - xattn: only cross-attn (attn2)
    - selfattn: only self-attn (attn1)
    - full: everything
    - notime: everything except time embedding
    """

    def decide(path) -> bool:
        keys = [getattr(p, "key", "") for p in path]
        joined = "/".join(keys)
        in_xattn = "attn2" in joined
        in_selfattn = "attn1" in joined
        in_time = "time_embedding" in joined or "time_emb_proj" in joined
        if method == "full":
            return True
        if method == "noxattn":
            return not (in_xattn or in_time)
        if method == "notime":
            return not in_time
        if method == "xattn":
            return in_xattn
        if method == "selfattn":
            return in_selfattn
        raise ValueError(method)

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def masked_optimizer(tx: optax.GradientTransformation, mask: Dict) -> optax.GradientTransformation:
    """Train only where mask is True; frozen leaves get zero updates.
    (optax.masked would pass raw gradients through for masked-out leaves.)"""
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_esd_step(
    unet,
    sched: DiffusionSchedule,
    tx: optax.GradientTransformation,
    negative_guidance: float = 1.0,
    ddim_steps: int = 50,
    start_guidance: float = 3.0,
):
    """Returns step(params, frozen_params, opt_state, concept_embeds,
    neutral_embeds, rng) -> (params, opt_state, loss).

    Per reference: sample t_enc ~ U(0, ddim_steps), run a short CFG DDIM
    rollout from noise with the CURRENT student to get z_t, then
    loss = || e_student(z_t, c) - (e0_neutral - ng*(e0_pos - e0_neutral)) ||^2
    with e0_* from the frozen model (no grad).
    """
    ts = jnp.asarray(ddim_timesteps(sched, ddim_steps))

    @partial(jax.jit, donate_argnums=(0, 2), static_argnames=("latent_hw",))
    def step(params, frozen_params, opt_state, concept_embeds, neutral_embeds, rng,
             latent_hw: int = 64):
        b = concept_embeds.shape[0]
        k_noise, k_t = jax.random.split(rng)
        t_enc_idx = jax.random.randint(k_t, (), 0, ddim_steps)
        z = jax.random.normal(k_noise, (b, latent_hw, latent_hw, 4))

        def model(p, x, t, ctx):
            t_b = jnp.broadcast_to(t, (x.shape[0],))
            return unet.apply({"params": p}, x, t_b, ctx)

        def cfg_pred(p, x, t):
            cond = model(p, x, t, concept_embeds)
            uncond = model(p, x, t, neutral_embeds)
            return uncond + start_guidance * (cond - uncond)

        # partial rollout with the current student (no grad through it).
        # while_loop gives a true data-dependent trip count — the reference
        # runs exactly t_enc steps (esd_diffusers.py:85-95); a masked full
        # fori_loop would cost the whole 50-step rollout every training step
        def cond(carry):
            i, _ = carry
            return i < t_enc_idx

        def body(carry):
            i, x = carry
            t = ts[i]
            prev_t = ts[jnp.minimum(i + 1, ddim_steps - 1)]
            pred = cfg_pred(params, x, t)
            return i + 1, ddim_step(sched, pred, t, prev_t, x)

        _, z_t = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), z))
        z_t = jax.lax.stop_gradient(z_t)
        t_enc = ts[t_enc_idx]

        e0_pos = jax.lax.stop_gradient(model(frozen_params, z_t, t_enc, concept_embeds))
        e0_neutral = jax.lax.stop_gradient(model(frozen_params, z_t, t_enc, neutral_embeds))
        target = e0_neutral - negative_guidance * (e0_pos - e0_neutral)

        def loss_fn(p):
            e_student = model(p, z_t, t_enc, concept_embeds)
            return jnp.mean((e_student - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    return step
