"""Sampling pipelines.

TPU-native rebuild of the reference's StableDiffusionPruningPipeline
(pdm/pipelines/pruning_pipelines.py:46-1612):

- `SDPipeline.generate_samples` — fixed (pruned/plain) U-Net sampling: the
  CFG denoise loop is ONE jitted lax.fori_loop (DDIM or PNDM/PLMS), compiled
  once per (shape, steps) and reused across prompts/batches — vs the
  reference's Python loop of per-step graph launches.
- `PruningPipeline.__call__` — dynamic expert routing: prompt -> MPNet ->
  hypernet -> quantizer -> gate structure -> gated U-Net, returning images +
  expert indices + resource ratios (pruning_pipelines.py:629-866).
- `quantizer_samples` / `depth_analysis` / `sample_progressive` parity
  methods (pruning_pipelines.py:1243, 1460, 1014).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNet2DConditionModel
from ..schedulers import (
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
    pndm_init,
    pndm_step,
    pndm_timesteps,
)
from ..utils import macs as macs_lib
from ..utils.arch import Structure
from ..utils.estimation import hard_concrete


class SDPipeline:
    """Minimal component container. Text encoding happens host-side (or via
    precomputed embeddings); everything after is jitted."""

    def __init__(
        self,
        unet: UNet2DConditionModel,
        unet_params,
        vae,
        vae_params,
        sched: DiffusionSchedule,
        scheduler_type: str = "ddim",
        text_encoder=None,
        text_params=None,
        tokenizer=None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.sched = sched
        self.scheduler_type = scheduler_type
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer

    # ---- text -----------------------------------------------------------
    def encode_prompts(self, prompts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None and self.text_params is not None
        ids = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        ).input_ids
        hidden, _ = self.text_encoder.apply({"params": self.text_params}, jnp.asarray(ids))
        return hidden

    # ---- core loop ---------------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("self", "num_inference_steps", "guidance_scale", "return_trajectory"))
    def _denoise(
        self,
        unet_params,
        latents,
        context,  # [2B, L, D]: [uncond; cond]
        rng,
        num_inference_steps: int,
        guidance_scale: float,
        structure: Optional[Structure] = None,
        return_trajectory: bool = False,
        added_cond: Optional[dict] = None,  # SDXL: 2B-shaped text_embeds/time_ids
    ):
        sched = self.sched

        def model(x, t):
            x_in = jnp.concatenate([x, x], axis=0)
            t_b = jnp.broadcast_to(t, (x_in.shape[0],))
            out = self.unet.apply(
                {"params": unet_params}, x_in, t_b, context, structure,
                added_cond=added_cond,
            )
            uncond, cond = jnp.split(out, 2, axis=0)
            return uncond + guidance_scale * (cond - uncond)

        if self.scheduler_type == "ddim":
            ts = jnp.asarray(ddim_timesteps(sched, num_inference_steps))

            def body(i, carry):
                x, traj = carry
                t = ts[i]
                prev_t = jnp.where(
                    i + 1 < num_inference_steps, ts[jnp.minimum(i + 1, num_inference_steps - 1)],
                    -1,
                )
                pred = model(x, t)
                x = ddim_step(sched, pred, t, prev_t, x)
                if return_trajectory:
                    traj = traj.at[i].set(x)
                return x, traj

            traj0 = (
                jnp.zeros((num_inference_steps,) + latents.shape, latents.dtype)
                if return_trajectory
                else jnp.zeros((0,))
            )
            x, traj = jax.lax.fori_loop(0, num_inference_steps, body, (latents, traj0))
        elif self.scheduler_type == "pndm":
            ts = jnp.asarray(pndm_timesteps(sched, num_inference_steps))
            state0 = pndm_init(latents.shape, latents.dtype)

            def body(i, carry):
                x, state, traj = carry
                t = ts[i]
                pred = model(x, t)
                x, state = pndm_step(sched, state, pred, t, x, num_inference_steps)
                if return_trajectory:
                    traj = traj.at[i].set(x)
                return x, state, traj

            traj0 = (
                jnp.zeros((len(pndm_timesteps(sched, num_inference_steps)),) + latents.shape,
                          latents.dtype)
                if return_trajectory
                else jnp.zeros((0,))
            )
            x, _, traj = jax.lax.fori_loop(
                0, num_inference_steps + 1, body, (latents, state0, traj0)
            )
        else:
            raise ValueError(f"unknown scheduler {self.scheduler_type}")
        return x, traj

    @functools.partial(jax.jit, static_argnames=("self", "as_uint8"))
    def _decode_jit(self, vae_params, latents, as_uint8: bool = False):
        img = self.vae.apply({"params": vae_params}, latents, method=self.vae.decode)
        img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
        if as_uint8:
            # quantize ON DEVICE: the host fetch is 4x smaller — the
            # device->host tunnel is the FID-generation path's side channel
            # (the reference saves uint8 .npy anyway, generate_fid_images.py)
            img = jnp.round(img * 255.0).astype(jnp.uint8)
        return img

    def _decode(self, latents, as_uint8: bool = False):
        return self._decode_jit(self.vae_params, latents, as_uint8)

    @property
    def vae_scale_factor(self) -> int:
        return 2 ** (len(self.vae.cfg.block_out_channels) - 1)

    def prepare_latents(self, batch: int, height: int, width: int, rng) -> jnp.ndarray:
        f = self.vae_scale_factor
        shape = (batch, height // f, width // f, self.unet.spec.in_channels)
        return jax.random.normal(rng, shape, jnp.float32)  # init_noise_sigma = 1

    def generate_samples(
        self,
        prompt_embeds: jnp.ndarray,
        empty_prompt_embeds: jnp.ndarray,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        height: int = 512,
        width: int = 512,
        seed: int = 0,
        structure: Optional[Structure] = None,
        unet_params=None,
        latents: Optional[jnp.ndarray] = None,
        added_cond: Optional[dict] = None,
        output_uint8: bool = False,
        device_output: bool = False,
    ) -> np.ndarray:
        """Fixed-architecture sampling (generate_samples,
        pruning_pipelines.py:867-1010; the FID-generation path). Explicit
        ``latents`` override the seed — used for per-prompt seeds (the artist
        benchmark CSVs carry an evaluation_seed per row). ``added_cond`` is
        SDXL micro-conditioning, 2B-shaped like the CFG context ([uncond;
        cond] — see sdxl_added_cond). ``output_uint8`` quantizes to uint8 on
        device (4x smaller host fetch; the FID/eval writers save uint8).
        ``device_output`` skips the host fetch and returns the (still
        asynchronously computing) device array — the writers double-buffer:
        dispatch batch N+1, then fetch/encode batch N while it computes."""
        b = prompt_embeds.shape[0]
        rng = jax.random.PRNGKey(seed)
        if latents is None:
            latents = self.prepare_latents(b, height, width, rng)
        context = jnp.concatenate([empty_prompt_embeds, prompt_embeds], axis=0)
        x, _ = self._denoise(
            unet_params if unet_params is not None else self.unet_params,
            latents, context, rng, num_inference_steps, float(guidance_scale),
            structure, added_cond=added_cond,
        )
        out = self._decode(x, as_uint8=output_uint8)
        return out if device_output else np.asarray(out)

    def sample_progressive(self, prompt_embeds, empty_prompt_embeds, num_inference_steps=50,
                           guidance_scale=7.5, height=512, width=512, seed=0,
                           structure=None, added_cond=None) -> np.ndarray:
        """All intermediate decoded frames (pruning_pipelines.py:1014)."""
        b = prompt_embeds.shape[0]
        rng = jax.random.PRNGKey(seed)
        latents = self.prepare_latents(b, height, width, rng)
        context = jnp.concatenate([empty_prompt_embeds, prompt_embeds], axis=0)
        _, traj = self._denoise(
            self.unet_params, latents, context, rng, num_inference_steps,
            float(guidance_scale), structure, return_trajectory=True,
            added_cond=added_cond,
        )
        return np.stack([np.asarray(self._decode(t)) for t in traj])


def sdxl_added_cond(pooled_uncond: jnp.ndarray, pooled_cond: jnp.ndarray,
                    height: int, width: int) -> dict:
    """SDXL micro-conditioning for the CFG-concatenated ([uncond; cond])
    denoise batch: text_embeds = the pooled projections, time_ids =
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w) — the
    diffusers defaults the reference inherits."""
    text_embeds = jnp.concatenate([pooled_uncond, pooled_cond], axis=0)
    ids = jnp.asarray([height, width, 0, 0, height, width], jnp.float32)
    time_ids = jnp.broadcast_to(ids, (text_embeds.shape[0], 6))
    return {"text_embeds": text_embeds, "time_ids": time_ids}


class PruningPipeline(SDPipeline):
    """Adds hypernet/quantizer routing on top of SDPipeline."""

    def __init__(self, *args, hypernet=None, hypernet_params=None, quantizer_cfg=None,
                 quantizer_params=None, quantizer_state=None, layout=None,
                 mpnet=None, mpnet_params=None, mpnet_tokenizer=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.hypernet = hypernet
        self.hypernet_params = hypernet_params
        self.qcfg = quantizer_cfg
        self.qparams = quantizer_params
        self.qstate = quantizer_state
        self.layout = layout
        self.mpnet = mpnet
        self.mpnet_params = mpnet_params
        self.mpnet_tokenizer = mpnet_tokenizer

    def route(self, mpnet_embeddings: jnp.ndarray):
        """prompt embedding -> (hard structure, expert indices)
        (pruning_pipelines.py:757-770)."""
        logits = self.hypernet.apply({"params": self.hypernet_params}, mpnet_embeddings)
        zq, idx, _ = self.qcfg(
            jax.random.PRNGKey(0), self.qparams, self.qstate, logits, training=False
        )
        return self.layout.split(zq), idx

    def __call__(
        self,
        mpnet_embeddings: jnp.ndarray,
        prompt_embeds: jnp.ndarray,
        empty_prompt_embeds: jnp.ndarray,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        height: int = 512,
        width: int = 512,
        seed: int = 0,
        safety_checker=None,
        added_cond: Optional[dict] = None,
    ):
        """Routed sampling. With ``safety_checker`` (pipelines.SafetyChecker)
        flagged images are blacked out and the per-image nsfw flags are
        appended to the return tuple — run_safety_checker semantics
        (pruning_pipelines.py:840-857)."""
        structure, idx = self.route(mpnet_embeddings)
        images = self.generate_samples(
            prompt_embeds, empty_prompt_embeds, num_inference_steps, guidance_scale,
            height, width, seed, structure=structure, added_cond=added_cond,
        )
        macs = macs_lib.calc_macs(self.unet.spec, structure)
        full = macs_lib.calc_macs(self.unet.spec, self.layout.ones(1))["cur_prunable"][0]
        ratios = np.asarray(macs["cur_prunable"] / full)
        if safety_checker is not None:
            images, has_nsfw = safety_checker(np.asarray(images))
            return images, np.asarray(idx), ratios, has_nsfw
        return images, np.asarray(idx), ratios

    def quantizer_samples(self, prompt_embeds, empty_prompt_embeds, expert_ids=None,
                          **kwargs):
        """Sample each codebook expert's architecture
        (pruning_pipelines.py:1243)."""
        n_e = self.qparams["embedding"].shape[0]
        expert_ids = expert_ids if expert_ids is not None else range(n_e)
        out = {}
        for e in expert_ids:
            z = hard_concrete(self.qstate["embedding_gs"][e : e + 1])
            z = jnp.repeat(z, prompt_embeds.shape[0], axis=0)
            structure = self.layout.split(z)
            out[int(e)] = self.generate_samples(
                prompt_embeds, empty_prompt_embeds, structure=structure, **kwargs
            )
        return out

    def depth_analysis(self, prompt_embeds, empty_prompt_embeds, **kwargs):
        """Ablate each depth gate in turn with all widths on
        (pruning_pipelines.py:1460)."""
        b = prompt_embeds.shape[0]
        results = {}
        for d in range(self.layout.num_depth):
            ones = self.layout.ones(b)
            depth = list(ones.depth)
            depth[d] = jnp.zeros((b,))
            structure = Structure(width=ones.width, depth=tuple(depth))
            results[d] = self.generate_samples(
                prompt_embeds, empty_prompt_embeds, structure=structure, **kwargs
            )
        return results


class SDXLPruningPipeline(PruningPipeline):
    """SDXL-checkpoint analysis pipeline: dual CLIP towers feed encode, the
    pooled micro-conditioning rides through the denoise loop as added_cond
    (diffusers SDXL encode_prompt semantics the reference inherits;
    trainer-side analogue training/sdxl_pruner.py:84-121). Prompt embeddings
    are (hidden, pooled) pairs so analyze.py's encode->sample flow stays
    uniform across model families."""

    def __init__(self, *args, text_encoder_2=None, text_params_2=None,
                 tokenizer_2=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.text_encoder_2 = text_encoder_2
        self.text_params_2 = text_params_2
        self.tokenizer_2 = tokenizer_2

    def encode_prompts(self, prompts: Sequence[str]):
        """-> (prompt_embeds [B, L, 768+1280], pooled [B, proj_dim])."""
        assert self.tokenizer is not None and self.text_params is not None
        assert self.tokenizer_2 is not None and self.text_params_2 is not None
        ids1 = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.tokenizer.model_max_length, return_tensors="np",
        ).input_ids
        ids2 = self.tokenizer_2(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.tokenizer_2.model_max_length, return_tensors="np",
        ).input_ids
        _, _, h1 = self.text_encoder.apply(
            {"params": self.text_params}, jnp.asarray(ids1), penultimate=True
        )
        _, pooled2, h2 = self.text_encoder_2.apply(
            {"params": self.text_params_2}, jnp.asarray(ids2), penultimate=True
        )
        return jnp.concatenate([h1, h2], axis=-1), pooled2

    @staticmethod
    def _added(pe, epe, height, width):
        (pe_h, pooled), (epe_h, epooled) = pe, epe
        return pe_h, epe_h, sdxl_added_cond(epooled, pooled, height, width)

    def __call__(self, mpnet_embeddings, prompt_embeds, empty_prompt_embeds,
                 height: int = 1024, width: int = 1024, **kwargs):
        pe, epe, added = self._added(prompt_embeds, empty_prompt_embeds, height, width)
        return super().__call__(
            mpnet_embeddings, pe, epe, height=height, width=width,
            added_cond=added, **kwargs
        )

    def quantizer_samples(self, prompt_embeds, empty_prompt_embeds,
                          expert_ids=None, height: int = 1024, width: int = 1024,
                          **kwargs):
        pe, epe, added = self._added(prompt_embeds, empty_prompt_embeds, height, width)
        return super().quantizer_samples(
            pe, epe, expert_ids=expert_ids, height=height, width=width,
            added_cond=added, **kwargs
        )

    def depth_analysis(self, prompt_embeds, empty_prompt_embeds,
                       height: int = 1024, width: int = 1024, **kwargs):
        pe, epe, added = self._added(prompt_embeds, empty_prompt_embeds, height, width)
        return super().depth_analysis(
            pe, epe, height=height, width=width, added_cond=added, **kwargs
        )
