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
