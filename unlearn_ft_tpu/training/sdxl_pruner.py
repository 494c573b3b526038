"""SDXL APTP pruning trainer (reference SDXLPruner, trainer.py:1472-1593):
same objective as PruningTrainer with dual CLIP text encoders — the batch
carries the concatenated 2048-d hidden states plus pooled micro-conditioning
('text_embeds', 'time_ids'), precomputed host-side by the in-framework dual
towers (text_encoder = CLIP ViT-L, text_encoder_2 = OpenCLIP bigG with
text_projection) when the model root provides them.
"""
from __future__ import annotations

import os
from dataclasses import asdict
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
from ..models.clip_text import (
    CLIPTextConfig,
    CLIPTextModel,
    sdxl_text_encoder_2_config,
    sdxl_text_encoder_config,
)
from ..utils import macs as macs_lib
from ..utils.config import Config
from ..utils.logging_utils import logger
from .pruner import PruningTrainer
from .steps import (
    _accumulated_pruner_grads,
    _forward_process,
    _get_latents,
    _safe_update,
)


class SDXLPruningTrainer(PruningTrainer):
    """Overrides the jitted step to thread SDXL's added_cond through the
    gated U-Net; everything else (hypernet/quantizer/losses) is shared."""

    def build_frozen_towers(self):
        cfg = self.config
        root = str(cfg.get("pretrained_model_name_or_path", ""))
        # SDXL's first tower is CLIP ViT-L (quick_gelu), not the SD-2.1
        # default; only override when the config didn't pin one
        if not cfg.model.get("text_encoder_config") and os.path.isdir(
            os.path.join(root, "text_encoder")
        ):
            cfg.model.text_encoder_config = Config.wrap(
                asdict(sdxl_text_encoder_config())
            )
        super().build_frozen_towers()
        # second tower: OpenCLIP ViT-bigG with text_projection (reference
        # SDXLPruner.init_models loads tokenizer_2/text_encoder_2,
        # trainer.py:1479-1593)
        te2_cfg_dict = cfg.model.get("text_encoder_2_config")
        self.text_encoder_2 = None
        self.text_params_2 = None
        te2_dir = os.path.join(root, "text_encoder_2")
        if te2_cfg_dict or os.path.isdir(te2_dir):
            cfg2 = CLIPTextConfig(
                **(te2_cfg_dict or asdict(sdxl_text_encoder_2_config()))
            )
            self.text_encoder_2 = CLIPTextModel(cfg2, dtype=self.dtype)
            if os.path.isdir(te2_dir):
                from ..models.convert import convert_clip_text, load_torch_state_dict

                for name in ("model.safetensors", "pytorch_model.bin"):
                    p = os.path.join(te2_dir, name)
                    if os.path.exists(p):
                        self.text_params_2 = convert_clip_text(
                            load_torch_state_dict(p), cfg2.num_hidden_layers
                        )
                        break

    def _encode_sdxl_prompts(self, captions):
        """Dual-tower encoding (diffusers SDXL encode_prompt semantics the
        reference inherits): per caption, concat the two penultimate hidden
        states -> prompt_embeds [L, 768+1280]; pooled projection of encoder 2
        -> text_embeds."""
        from transformers import CLIPTokenizer

        root = str(self.config.get("pretrained_model_name_or_path", ""))
        tok1 = CLIPTokenizer.from_pretrained(os.path.join(root, "tokenizer"))
        tok2_dir = os.path.join(root, "tokenizer_2")
        tok2 = CLIPTokenizer.from_pretrained(
            tok2_dir if os.path.isdir(tok2_dir) else os.path.join(root, "tokenizer")
        )

        enc1, enc2 = self.text_encoder, self.text_encoder_2

        @jax.jit
        def encode(ids1, ids2):
            _, _, h1 = enc1.apply(
                {"params": self.text_params}, ids1, penultimate=True
            )
            _, pooled2, h2 = enc2.apply(
                {"params": self.text_params_2}, ids2, penultimate=True
            )
            return jnp.concatenate([h1, h2], axis=-1), pooled2

        out_pe, out_pool = [], []
        bs = 64
        for i in range(0, len(captions), bs):
            chunk = list(captions[i : i + bs])
            ids1 = tok1(chunk, padding="max_length", truncation=True,
                        max_length=tok1.model_max_length, return_tensors="np").input_ids
            ids2 = tok2(chunk, padding="max_length", truncation=True,
                        max_length=tok2.model_max_length, return_tensors="np").input_ids
            pe, pool = encode(jnp.asarray(ids1), jnp.asarray(ids2))
            out_pe.append(np.asarray(pe, np.float32))
            out_pool.append(np.asarray(pool, np.float32))
        return np.concatenate(out_pe), np.concatenate(out_pool)

    def make_steps(self):
        self.step_fn = make_sdxl_pruner_step(
            self.unet, self.hypernet, self.qcfg, self.vae, self.layout,
            self.full_spec, self.sched, self.loss_cfg, self.tx,
            seq_kv=int(self.config.get_path("data.synthetic_seq_len", 77)),
            grad_accum=self.grad_accum,
        )

    def _make_eval_step(self):
        return make_sdxl_pruner_eval_step(
            self.unet, self.hypernet, self.qcfg, self.vae, self.layout,
            self.full_spec, self.sched, self.loss_cfg,
            seq_kv=int(self.config.get_path("data.synthetic_seq_len", 77)),
        )

    def _build_pipeline(self):
        """SDXL-aware PruningPipeline (dual towers feed encode; the
        added_cond rides through the denoise loop via sdxl_added_cond)."""
        if self.text_params is None or self.text_params_2 is None:
            return None
        from ..pipelines import PruningPipeline

        return PruningPipeline(
            self.unet, None, self.vae, self.vae_params, self.sched,
            scheduler_type="ddim", text_encoder=self.text_encoder,
            text_params=self.text_params, tokenizer=None,
            hypernet=self.hypernet, quantizer_cfg=self.qcfg,
            layout=self.layout, mpnet=self.mpnet,
            mpnet_params=self.mpnet_params,
        )


    def log_expert_samples(self):
        """Per-expert sample grids with the dual-tower context + pooled
        micro-conditioning threaded through the gated SDXL U-Net."""
        prompts = self.config.get_path("data.prompts")
        if not prompts:
            return
        pipe = self.get_pipeline()
        if pipe is None:
            return
        import numpy as np

        from ..pipelines.sd_pipeline import sdxl_added_cond
        from ..utils.image_io import save_image

        g = self.config.get_path
        res = int(g("model.prediction_model.resolution", 1024))
        steps = int(g("training.num_inference_steps", 10))
        out_dir = os.path.join(self.logging_dir, f"pruning-samples-{self.global_step}")
        os.makedirs(out_dir, exist_ok=True)

        pe, pooled = self._encode_sdxl_prompts(list(prompts))
        epe, epooled = self._encode_sdxl_prompts([""] * len(prompts))
        added = sdxl_added_cond(jnp.asarray(epooled), jnp.asarray(pooled), res, res)
        n_e = np.asarray(self.qstate["embedding_gs"]).shape[0]
        max_e = int(g("training.logging.max_sample_experts", 4) or 4)
        samples = pipe.quantizer_samples(
            jnp.asarray(pe), jnp.asarray(epe), expert_ids=range(min(n_e, max_e)),
            num_inference_steps=steps, height=res, width=res, added_cond=added,
        )
        for e, imgs in samples.items():
            for i, img in enumerate(np.asarray(imgs)):
                save_image(img, os.path.join(out_dir, f"expert{e}_{i}.png"))
        logger.info("logged SDXL pruning sample images to %s", out_dir)

    def _make_collate(self, ds, train: bool = True):
        base = super()._make_collate(ds, train=train)
        res = int(self.config.get_path("model.prediction_model.resolution", 512))
        time_ids = np.array([res, res, 0, 0, res, res], np.float32)

        dual = (
            getattr(self, "text_encoder_2", None) is not None
            and self.text_params_2 is not None
            and self.text_params is not None
            and hasattr(ds, "records")
            and getattr(ds.records[0] if len(ds) else None, "caption", None) is not None
        )
        if dual:
            pe, pooled = self._encode_sdxl_prompts([r.caption for r in ds.records])
            empty_pe, empty_pooled = self._encode_sdxl_prompts([""])
            logger.info("SDXL dual-tower embeddings precomputed: %s", pe.shape)

            def collate(indices):
                batch = base(indices)
                # replace the single-tower embeds with the dual-tower concat
                batch["prompt_embeds"] = pe[list(indices)]
                batch["empty_prompt_embeds"] = np.repeat(
                    empty_pe, len(indices), axis=0
                )
                batch["text_embeds"] = pooled[list(indices)]
                batch["time_ids"] = np.tile(time_ids[None], (len(indices), 1))
                return batch

            return collate

        # synthetic fallback: random micro-conditioning of the right dims
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
            batch["time_ids"] = np.tile(time_ids[None], (b, 1))
            return batch

        return collate

    def run_step(self, batch, rng) -> Dict:
        self.trainable, self.opt_state, self.qstate, metrics = self.step_fn(
            self.trainable, self.opt_state, self.qstate, self.frozen, batch, rng
        )
        return metrics


def _sdxl_pruner_loss_fn(
    unet, hypernet, qcfg, vae, layout, spec, sched, loss_cfg, seq_kv, macs_table
):
    """Shared SDXL pruning loss surface (train step differentiates it,
    make_sdxl_pruner_eval_step evaluates it with training=False)."""

    def loss_for(p, quant_state, frozen, batch, rng, training):
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

        arch_logits = hypernet.apply({"params": p["hypernet"]}, mpnet_emb)
        zq, idx, new_qstate = qcfg(
            k_q, p["quantizer"], quant_state, arch_logits, training=training
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

    return loss_for


def make_sdxl_pruner_eval_step(
    unet, hypernet, qcfg, vae, layout, spec, sched, loss_cfg, seq_kv: int = 77,
):
    """SDXL validation losses (reference SDXLPruner inherits
    UnetPruner.validate, trainer.py:1093-1147)."""
    macs_table = macs_lib.unet_macs(spec, seq_kv)
    loss_for = _sdxl_pruner_loss_fn(
        unet, hypernet, qcfg, vae, layout, spec, sched, loss_cfg, seq_kv, macs_table
    )

    @jax.jit
    def eval_step(trainable, quant_state, frozen, batch, rng):
        _, (metrics, _) = loss_for(trainable, quant_state, frozen, batch, rng, False)
        return metrics

    return eval_step


def make_sdxl_pruner_step(
    unet, hypernet, qcfg, vae, layout, spec, sched, loss_cfg, tx,
    seq_kv: int = 77, grad_accum: int = 1,
):
    """SDXL counterpart of steps.make_pruner_step (reference SDXLPruner.step,
    trainer.py:1472-1593): identical hypernet/quantizer objective, with the
    dual-tower 2048-d context plus pooled micro-conditioning
    ('text_embeds'/'time_ids') threaded through the gated U-Net as
    added_cond. Module-level so bench.py can drive it on synthetic shapes."""
    macs_table = macs_lib.unet_macs(spec, seq_kv)
    loss_for = _sdxl_pruner_loss_fn(
        unet, hypernet, qcfg, vae, layout, spec, sched, loss_cfg, seq_kv, macs_table
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
