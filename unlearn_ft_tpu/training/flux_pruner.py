"""Flux APTP pruning trainer (reference FluxPruner, trainer.py:1596-2113):
flow-matching loss + contrastive + resource over the gated Flux MMDiT, with
hypernet/quantizer as the only trainables.

Text conditioning (T5 + CLIP-pooled) is precomputed host-side into the batch
('prompt_embeds', 'pooled_prompt_embeds'), as are packed latents when a real
Flux VAE is supplied; synthetic mode generates matching random tensors.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader
from ..data.datasets import SyntheticDataset
from ..models.flux import FluxConfig, GatedFluxTransformer2DModel, flux_gate_layout, make_image_ids
from ..models.hypernet import HyperStructure
from ..models.quantizer import QuantizerConfig
from ..parallel import replicate
from ..schedulers import FlowMatchSchedule
from ..utils import flux_macs as fm
from ..utils.logging_utils import logger
from .pruner import PruningTrainer
from .steps import make_flux_pruner_step


class FluxPruningTrainer(PruningTrainer):
    def init_models(self):
        cfg = self.config
        g = cfg.get_path
        fc = cfg.model.prediction_model.get("flux_config") or {}
        self.flux_cfg = FluxConfig(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in fc.items()
        })
        self.layout = flux_gate_layout(self.flux_cfg)
        self.flux = GatedFluxTransformer2DModel(self.flux_cfg, dtype=self.dtype)
        self.fm_sched = FlowMatchSchedule(
            shift=float(g("model.prediction_model.flow_shift", 1.0))
        )

        # shapes
        self.l_img = int(g("data.flux_image_tokens", 64))
        self.l_txt = int(g("data.flux_text_tokens", 8))
        b = 1
        key = jax.random.PRNGKey(self.seed)
        hidden = jnp.zeros((b, self.l_img, self.flux_cfg.in_channels))
        ctx = jnp.zeros((b, self.l_txt, self.flux_cfg.joint_attention_dim))
        pooled = jnp.zeros((b, self.flux_cfg.pooled_projection_dim))
        t = jnp.zeros((b,))
        side = int(2 * np.sqrt(self.l_img))
        img_ids = jnp.asarray(make_image_ids(side, side, b))
        txt_ids = jnp.zeros((b, self.l_txt, 3))
        guidance = jnp.zeros((b,)) if self.flux_cfg.guidance_embeds else None
        flux_params = self.flux.init(
            key, hidden, ctx, pooled, t, img_ids, txt_ids, guidance
        )["params"]

        self.hypernet = HyperStructure(
            self.layout, input_dim=int(g("model.hypernet.input_dim", 768)),
            dtype=self.dtype,
        )
        hparams = self.hypernet.init(
            jax.random.PRNGKey(self.seed + 2), jnp.zeros((1, self.hypernet.input_dim))
        )["params"]
        self.qcfg = QuantizerConfig(
            layout=self.layout,
            n_e=int(g("model.quantizer.num_arch_vq_codebook_embeddings", 8)),
        )
        qparams = self.qcfg.init_params(jax.random.PRNGKey(self.seed + 3))
        qstate = self.qcfg.init_state(qparams)

        table = fm.flux_macs(self.flux_cfg, self.l_img, self.l_txt)
        norm = table["prunable"]
        qstate = self.qcfg.set_prunable_macs_template(
            qstate, [[v / norm for v in sub] for sub in table["per_submodule_prunable"]]
        )
        ones = self.layout.ones(1)
        full_cur = float(fm.flux_calc_macs(
            self.flux_cfg, self.layout, ones, self.l_img, self.l_txt, table
        )["cur_prunable"][0])
        p = self.loss_cfg.resource_target
        p_actual = 1.0 - (1.0 - p) * table["total"] / full_cur
        self.loss_cfg = replace(self.loss_cfg, resource_target=float(p_actual))
        logger.info("flux pruning target rescaled: %.3f -> %.3f", p, p_actual)

        self.student_spec = None
        self.arch_vector = None
        self.trainable = replicate({"hypernet": hparams, "quantizer": qparams}, self.mesh)
        self.qstate = replicate(qstate, self.mesh)
        self.frozen = replicate({"flux": jax.tree.map(jnp.asarray, flux_params)}, self.mesh)

    def init_datasets(self):
        cfg = self.config
        n = cfg.get_path("data.max_train_samples") or 64
        ds = SyntheticDataset(n=n)
        self.dataset = ds
        bs = int(cfg.get_path("data.dataloader.train_batch_size", 8))
        rng = np.random.default_rng(self.seed)
        fc, l_img, l_txt = self.flux_cfg, self.l_img, self.l_txt
        side = int(2 * np.sqrt(l_img))

        def collate(indices):
            b = len(indices)
            return {
                "latents": rng.standard_normal((b, l_img, fc.in_channels)).astype(np.float32),
                "prompt_embeds": rng.standard_normal(
                    (b, l_txt, fc.joint_attention_dim)
                ).astype(np.float32),
                "pooled_prompt_embeds": rng.standard_normal(
                    (b, fc.pooled_projection_dim)
                ).astype(np.float32),
                "img_ids": np.asarray(make_image_ids(side, side, b)),
                "txt_ids": np.zeros((b, l_txt, 3), np.float32),
                "mpnet_embeddings": rng.standard_normal((b, 768)).astype(np.float32),
            }

        self.train_loader = DataLoader(list(range(len(ds))), bs, collate, seed=self.seed)

    def make_steps(self):
        g = self.config.get_path
        self.step_fn = make_flux_pruner_step(
            self.flux, self.hypernet, self.qcfg, self.layout, self.flux_cfg,
            self.fm_sched, self.loss_cfg, self.tx, self.l_img, self.l_txt,
            weighting_scheme=g("model.prediction_model.weighting_scheme", "logit_normal"),
            guidance_scale=g("model.prediction_model.guidance_scale"),
        )

    def validate(self):
        pass  # SD-specific heatmaps don't apply; codebook logging TODO

    def run_step(self, batch, rng) -> Dict:
        self.trainable, self.opt_state, self.qstate, metrics = self.step_fn(
            self.trainable, self.opt_state, self.qstate, self.frozen, batch, rng
        )
        return {k: v for k, v in metrics.items() if k != "expert_indices"}
