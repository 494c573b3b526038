"""SDXL APTP pruning trainer (reference SDXLPruner, trainer.py:1472-1593):
same objective as PruningTrainer with dual CLIP text encoders — the batch
carries the concatenated 2048-d hidden states plus pooled micro-conditioning
('text_embeds', 'time_ids'), precomputed host-side.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import (
    block_distillation_loss,
    contrastive_loss,
    diffusion_loss,
    distillation_loss,
    resource_loss,
)
from ..utils import macs as macs_lib
from .pruner import PruningTrainer
from .steps import _forward_process, _get_latents, _safe_update


class SDXLPruningTrainer(PruningTrainer):
    """Overrides the jitted step to thread SDXL's added_cond through the
    gated U-Net; everything else (hypernet/quantizer/losses) is shared."""

    def make_steps(self):
        unet, hypernet, qcfg = self.unet, self.hypernet, self.qcfg
        layout, spec, sched, loss_cfg, tx = (
            self.layout, self.full_spec, self.sched, self.loss_cfg, self.tx
        )
        vae = self.vae
        seq_kv = int(self.config.get_path("data.synthetic_seq_len", 77))
        macs_table = macs_lib.unet_macs(spec, seq_kv)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(trainable, opt_state, quant_state, frozen, batch, rng):
            k_vae, k_fwd, k_q, k_gs = jax.random.split(rng, 4)
            latents = _get_latents(vae, frozen["vae"], batch, k_vae)
            noisy, timesteps, target = _forward_process(sched, loss_cfg, latents, k_fwd)
            ctx = batch["prompt_embeds"]
            added = {"text_embeds": batch["text_embeds"], "time_ids": batch["time_ids"]}
            mpnet_emb = batch["mpnet_embeddings"]
            bsz = latents.shape[0]

            ones = layout.ones(bsz)
            teacher_pred, teacher_acts = unet.apply(
                {"params": frozen["unet"]}, noisy, timesteps, ctx, ones,
                return_block_activations=True, added_cond=added,
            )
            teacher_pred = jax.lax.stop_gradient(teacher_pred)
            teacher_acts = jax.lax.stop_gradient(teacher_acts)
            full_cur = macs_lib.calc_macs(spec, ones, seq_kv, macs_table)["cur_prunable"][0]

            def loss_fn(p):
                arch_logits = hypernet.apply({"params": p["hypernet"]}, mpnet_emb)
                zq, idx, new_qstate = qcfg(
                    k_q, p["quantizer"], quant_state, arch_logits, training=True
                )
                arch_gs = qcfg.gumbel_sigmoid_trick(k_gs, arch_logits)
                arch_norm = qcfg.width_depth_normalize(quant_state, arch_gs)
                c_loss, _ = contrastive_loss(mpnet_emb, arch_norm)
                structure = layout.split(zq)
                pred, acts = unet.apply(
                    {"params": frozen["unet"]}, noisy, timesteps, ctx, structure,
                    return_block_activations=True, added_cond=added,
                )
                d_loss = diffusion_loss(
                    pred, target, timesteps, sched.alphas_cumprod, loss_cfg.snr_gamma,
                    sched.prediction_type,
                )
                dist = distillation_loss(pred, teacher_pred)
                blk = block_distillation_loss(acts, teacher_acts)
                ratios = macs_lib.calc_macs(spec, structure, seq_kv, macs_table)[
                    "cur_prunable"] / full_cur
                r_loss = resource_loss(ratios.mean(), loss_cfg.resource_target,
                                       loss_cfg.resource_type)
                loss = (
                    loss_cfg.diffusion_weight * d_loss
                    + loss_cfg.resource_weight * r_loss
                    + loss_cfg.contrastive_weight * c_loss
                    + loss_cfg.distillation_weight * dist
                    + loss_cfg.block_weight * blk
                )
                metrics = {"loss": loss, "diff_loss": d_loss, "distill_loss": dist,
                           "block_loss": blk, "contrastive_loss": c_loss,
                           "resource_loss": r_loss, "resource_ratio": ratios.mean()}
                return loss, (metrics, new_qstate)

            (loss, (metrics, new_qstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            new_trainable, new_opt_state = _safe_update(tx, grads, opt_state, trainable, loss)
            return new_trainable, new_opt_state, new_qstate, metrics

        self.step_fn = step

    def _make_collate(self, ds):
        base = super()._make_collate(ds)
        proj_dim = int(self.config.get_path(
            "model.prediction_model.unet_config.projection_class_embeddings_input_dim",
            2816,
        ))
        add_dim = int(self.config.get_path(
            "model.prediction_model.unet_config.addition_time_embed_dim", 256
        ))
        pooled_dim = proj_dim - 6 * add_dim
        rng = np.random.default_rng(self.seed + 11)

        def collate(indices):
            batch = base(indices)
            b = len(indices)
            batch["text_embeds"] = rng.standard_normal((b, pooled_dim)).astype(np.float32)
            batch["time_ids"] = np.tile(
                np.array([512, 512, 0, 0, 512, 512], np.float32)[None], (b, 1)
            )
            return batch

        return collate

    def run_step(self, batch, rng) -> Dict:
        self.trainable, self.opt_state, self.qstate, metrics = self.step_fn(
            self.trainable, self.opt_state, self.qstate, self.frozen, batch, rng
        )
        return metrics
