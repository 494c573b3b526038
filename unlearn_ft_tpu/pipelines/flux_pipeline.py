"""Flux sampling pipeline (reference FluxPruningPipeline,
pdm/pipelines/pruning_pipelines.py:1613-1914): flow-match Euler loop over the
gated Flux transformer, with optional hypernet/quantizer routing.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flux import (
    FluxConfig,
    GatedFluxTransformer2DModel,
    make_image_ids,
    pack_latents,
    unpack_latents,
)
from ..schedulers import FlowMatchSchedule, flow_match_step
from ..utils.arch import Structure


class FluxPipeline:
    def __init__(
        self,
        flux: GatedFluxTransformer2DModel,
        flux_params,
        fm_sched: FlowMatchSchedule,
        vae=None,
        vae_params=None,
        hypernet=None,
        hypernet_params=None,
        quantizer_cfg=None,
        quantizer_params=None,
        quantizer_state=None,
        layout=None,
    ):
        self.flux = flux
        self.flux_params = flux_params
        self.fm_sched = fm_sched
        self.vae = vae
        self.vae_params = vae_params
        self.hypernet = hypernet
        self.hypernet_params = hypernet_params
        self.qcfg = quantizer_cfg
        self.qparams = quantizer_params
        self.qstate = quantizer_state
        self.layout = layout

    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps", "guidance_scale"))
    def _denoise(
        self,
        flux_params,
        latents,  # packed [B, L, C]
        prompt_embeds,
        pooled,
        img_ids,
        txt_ids,
        sigmas,  # [steps+1]
        num_inference_steps: int,
        guidance_scale: float,
        structure: Optional[Structure] = None,
    ):
        guidance = (
            jnp.full((latents.shape[0],), guidance_scale)
            if self.flux.cfg.guidance_embeds
            else None
        )

        def body(i, x):
            sigma = sigmas[i]
            t = jnp.broadcast_to(sigma, (x.shape[0],))
            pred = self.flux.apply(
                {"params": flux_params}, x, prompt_embeds, pooled, t, img_ids, txt_ids,
                guidance, structure,
            )
            return flow_match_step(x, pred, sigma, sigmas[i + 1])

        return jax.lax.fori_loop(0, num_inference_steps, body, latents)

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,
        pooled_prompt_embeds: jnp.ndarray,
        mpnet_embeddings: Optional[jnp.ndarray] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        seed: int = 0,
        structure: Optional[Structure] = None,
    ):
        b = prompt_embeds.shape[0]
        # pixel->latent factor from the attached VAE (8 for the production
        # Flux VAE; tiny test VAEs downsample less)
        f = (
            2 ** (len(self.vae.cfg.block_out_channels) - 1)
            if self.vae is not None else 8
        )
        lat_h, lat_w = height // f, width // f
        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            rng, (b, lat_h, lat_w, self.flux.cfg.in_channels // 4), jnp.float32
        )
        packed = pack_latents(latents)
        img_ids = jnp.asarray(make_image_ids(lat_h, lat_w, b))
        txt_ids = jnp.zeros((b, prompt_embeds.shape[1], 3))

        indices = None
        if structure is None and self.hypernet is not None and mpnet_embeddings is not None:
            logits = self.hypernet.apply({"params": self.hypernet_params}, mpnet_embeddings)
            zq, indices, _ = self.qcfg(
                jax.random.PRNGKey(0), self.qparams, self.qstate, logits, training=False
            )
            structure = self.layout.split(zq)

        sigmas = jnp.asarray(self.fm_sched.inference_sigmas(num_inference_steps))
        out = self._denoise(
            self.flux_params, packed, prompt_embeds, pooled_prompt_embeds, img_ids,
            txt_ids, sigmas, num_inference_steps, float(guidance_scale), structure,
        )
        latents_out = unpack_latents(out, lat_h, lat_w)
        if self.vae is not None:
            img = self.vae.apply(
                {"params": self.vae_params}, latents_out, method=self.vae.decode
            )
            return np.asarray(jnp.clip(img / 2 + 0.5, 0, 1)), indices
        return np.asarray(latents_out), indices


class FluxPruningPipeline(FluxPipeline):
    """Flux-checkpoint analysis surface (reference FluxPruningPipeline,
    pruning_pipelines.py:1613-1914) with the same calling convention as
    PruningPipeline so scripts/aptp/analyze.py routes/samples all model
    families uniformly: encode_prompts -> (T5 sequence embeds, CLIP pooled),
    __call__(mpnet_emb, pe, empty) -> (images, expert indices, MACs ratios).

    Flux has no CFG uncond pass (guidance is an embedding on Flux-dev), so
    the ``empty_prompt_embeds`` slot is accepted and ignored; the flux gate
    layout has no depth gates, so depth_analysis returns {}.
    """

    def __init__(self, *args, text_encoder=None, text_params=None,
                 tokenizer=None, t5=None, t5_params=None, tokenizer_2=None,
                 mpnet=None, mpnet_params=None, max_text_tokens=512, **kwargs):
        super().__init__(*args, **kwargs)
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.t5 = t5
        self.t5_params = t5_params
        self.tokenizer_2 = tokenizer_2
        self.mpnet = mpnet
        self.mpnet_params = mpnet_params
        self.max_text_tokens = max_text_tokens

    def encode_prompts(self, prompts):
        """-> (t5_sequence [B, L, D], clip_pooled [B, P]) — diffusers
        FluxPipeline.encode_prompt semantics (T5 capped at
        max_sequence_length; reference trainer.py:1708-1710)."""
        assert self.tokenizer is not None and self.text_params is not None
        assert self.tokenizer_2 is not None and self.t5_params is not None
        ids1 = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        ).input_ids
        enc2 = self.tokenizer_2(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.max_text_tokens, return_tensors="np",
        )
        _, pooled = self.text_encoder.apply(
            {"params": self.text_params}, jnp.asarray(ids1)
        )
        seq = self.t5.apply(
            {"params": self.t5_params}, jnp.asarray(enc2.input_ids),
            jnp.asarray(enc2.attention_mask),
        )
        return seq, pooled

    def route(self, mpnet_embeddings: jnp.ndarray):
        logits = self.hypernet.apply({"params": self.hypernet_params}, mpnet_embeddings)
        zq, idx, _ = self.qcfg(
            jax.random.PRNGKey(0), self.qparams, self.qstate, logits, training=False
        )
        return self.layout.split(zq), idx

    def _ratios(self, structure, l_img, l_txt):
        from ..utils import flux_macs as fm

        table = fm.flux_macs(self.flux.cfg, l_img, l_txt)
        cur = fm.flux_calc_macs(
            self.flux.cfg, self.layout, structure, l_img, l_txt, table
        )["cur_prunable"]
        full = fm.flux_calc_macs(
            self.flux.cfg, self.layout,
            self.layout.ones(1), l_img, l_txt, table
        )["cur_prunable"][0]
        return np.asarray(cur / full)

    def __call__(self, mpnet_embeddings, prompt_embeds, empty_prompt_embeds=None,
                 num_inference_steps: int = 28, guidance_scale: float = 3.5,
                 height: int = 1024, width: int = 1024, seed: int = 0, **_):
        pe, pooled = prompt_embeds
        structure, idx = self.route(mpnet_embeddings)
        images, _ = super().__call__(
            pe, pooled, height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, seed=seed, structure=structure,
        )
        f = (2 ** (len(self.vae.cfg.block_out_channels) - 1)
             if self.vae is not None else 8)
        l_img = (height // f // 2) * (width // f // 2)
        ratios = self._ratios(structure, l_img, pe.shape[1])
        return images, np.asarray(idx), ratios

    def quantizer_samples(self, prompt_embeds, empty_prompt_embeds=None,
                          expert_ids=None, num_inference_steps: int = 28,
                          guidance_scale: float = 3.5, height: int = 1024,
                          width: int = 1024, seed: int = 0, **_):
        """Per-expert codebook sampling (pruning_pipelines.py:1243 analogue)."""
        from ..utils.estimation import hard_concrete

        pe, pooled = prompt_embeds
        n_e = self.qparams["embedding"].shape[0]
        expert_ids = expert_ids if expert_ids is not None else range(n_e)
        out = {}
        for e in expert_ids:
            z = hard_concrete(self.qstate["embedding_gs"][e : e + 1])
            z = jnp.repeat(z, pe.shape[0], axis=0)
            structure = self.layout.split(z)
            imgs, _ = super().__call__(
                pe, pooled, height=height, width=width,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, seed=seed, structure=structure,
            )
            out[int(e)] = imgs
        return out

    def depth_analysis(self, prompt_embeds, empty_prompt_embeds=None, **_):
        """Flux gates are width-only (the reference comments depth gates out,
        transformer_flux.py) — nothing to ablate."""
        return {}
