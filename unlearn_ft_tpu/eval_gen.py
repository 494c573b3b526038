"""Prompt-set image generation for the unlearning benchmarks.

The reference's benchmark drivers are self-contained: load a prompt set,
generate images with the (possibly erasure-overlaid) expert checkpoint, then
score them (baselines/concept_prune/nudity_eval.py:90-170,
artist_erasure.py:70-115). This module is the shared generation half for the
TPU rebuild: build an SDPipeline from a checkpoint dir (+ optional overlay),
then batch-generate a prompt list to PNGs with a prompts.json manifest so the
scoring half can attribute detections back to prompts.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence


def build_expert_pipeline(
    checkpoint_dir: str,
    pretrained_root: str,
    erasure_ckpt_path: Optional[str] = None,
    scheduler_type: str = "pndm",
    dtype=None,
):
    """(spec, SDPipeline) from a checkpoint-N dir + SD-layout model root,
    with an optional ESD/UCE erasure overlay applied to the U-Net params
    (the reference's --erasure_ckpt_path / load_models switchboard)."""
    import jax.numpy as jnp

    from .loading import load_text_tower, load_unet_from_checkpoint, load_vae_tower
    from .pipelines import SDPipeline
    from .schedulers import DiffusionSchedule

    dtype = dtype or jnp.bfloat16
    spec, unet, unet_params, _ = load_unet_from_checkpoint(checkpoint_dir, dtype=dtype)
    if erasure_ckpt_path:
        from .baselines.overlay import apply_erasure_overlay

        unet_params = apply_erasure_overlay(unet_params, spec, erasure_ckpt_path)
    vae, vae_params = load_vae_tower(pretrained_root, dtype=dtype)
    text_encoder, text_params, tokenizer = load_text_tower(pretrained_root, dtype=dtype)
    pipe = SDPipeline(
        unet, unet_params, vae, vae_params, DiffusionSchedule(),
        scheduler_type=scheduler_type, text_encoder=text_encoder,
        text_params=text_params, tokenizer=tokenizer,
    )
    return spec, pipe


def generate_prompt_images(
    pipe,
    prompts: Sequence[str],
    save_dir: str,
    batch_size: int = 16,
    num_inference_steps: int = 50,
    guidance_scale: float = 7.5,
    resolution: int = 512,
    seed: int = 0,
    seeds: Optional[Sequence[int]] = None,
    prefix: str = "",
    skip_existing: bool = True,
) -> List[str]:
    """Generate one image per prompt into ``save_dir`` as
    ``{prefix}{index:05d}.png`` plus a ``prompts.json`` manifest
    (index -> prompt). Work is sharded across hosts by jax.process_index.
    ``seeds`` gives a per-prompt latent seed (artist CSVs' evaluation_seed);
    otherwise one seed per batch derived from ``seed``.
    Returns the host-local list of written image paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    manifest_path = os.path.join(save_dir, "prompts.json")
    if jax.process_index() == 0:
        with open(manifest_path, "w") as f:
            json.dump({i: p for i, p in enumerate(prompts)}, f, indent=0)

    indices = list(range(len(prompts)))[jax.process_index() :: jax.process_count()]
    empty = pipe.encode_prompts([""] * batch_size)
    written: List[str] = []
    f = pipe.vae_scale_factor
    lat_hw = resolution // f
    for start in range(0, len(indices), batch_size):
        chunk = indices[start : start + batch_size]
        paths = [os.path.join(save_dir, f"{prefix}{i:05d}.png") for i in chunk]
        if skip_existing and all(os.path.exists(p) for p in paths):
            written.extend(paths)
            continue
        pad = batch_size - len(chunk)
        pe = pipe.encode_prompts([prompts[i] for i in chunk] + [""] * pad)
        latents = None
        if seeds is not None:
            # per-prompt latent seeds (reference seeds torch per row,
            # artist_erasure.py:100-110); batching keeps one latent per row
            latents = jnp.concatenate([
                jax.random.normal(
                    jax.random.PRNGKey(int(seeds[i])),
                    (1, lat_hw, lat_hw, pipe.unet.spec.in_channels), jnp.float32,
                )
                for i in chunk
            ] + [jnp.zeros((pad, lat_hw, lat_hw, pipe.unet.spec.in_channels))] * (1 if pad else 0))
        imgs = pipe.generate_samples(
            pe, empty, num_inference_steps, guidance_scale, resolution, resolution,
            seed=seed + start, latents=latents,
        )
        for j, path in enumerate(paths):
            Image.fromarray((np.asarray(imgs[j]) * 255).astype(np.uint8)).save(path)
            written.append(path)
        print(f"[{jax.process_index()}] generated {start + len(chunk)}/{len(indices)}",
              flush=True)
    return written
