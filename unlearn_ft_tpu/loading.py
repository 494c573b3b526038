"""Checkpoint / model-root loading helpers shared by the CLI entry points
(scripts/baselines/*, scripts/metrics/*).

The reference's equivalents are the ``from_pretrained`` calls sprinkled
through its scripts (generate_fid_images.py:67-118, the baselines'
utils/load_models.py): load a fine-tuned expert checkpoint + the frozen
towers of its pretrained root. Here the expert lives in an orbax checkpoint
with ``unet_spec.json`` / ``arch_vector.npy`` sidecars, and tower configs are
discovered from the HF dirs' config.json so any SD-layout root works
(SD-2.1, SD-1.x quick_gelu, or the tiny offline roots used in tests).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def load_unet_from_checkpoint(checkpoint_dir: str, dtype=None) -> Tuple:
    """Restore (spec, unet, params, step) from a ``checkpoint-{step}`` dir
    containing the ``unet_spec.json`` sidecar."""
    from .models.unet import UNet2DConditionModel
    from .training.checkpoint import CheckpointManager, spec_from_json

    with open(os.path.join(checkpoint_dir, "unet_spec.json")) as f:
        spec = spec_from_json(f.read())
    ckpt_root = os.path.dirname(os.path.abspath(checkpoint_dir))
    step = int(os.path.basename(checkpoint_dir.rstrip("/")).split("-")[-1])
    mgr = CheckpointManager(ckpt_root)
    unet = UNet2DConditionModel(spec, **({"dtype": dtype} if dtype else {}))
    # raw (template-free) restore: trainer checkpoints carry opt_state next
    # to params, and orbax rejects a params-only template against them
    params = mgr.restore_raw(step)["params"]
    return spec, unet, params, step


def load_text_tower(pretrained_root: str, subfolder: str = "text_encoder",
                    tokenizer_subfolder: Optional[str] = "tokenizer", dtype=None):
    """(text_encoder, text_params, tokenizer) from an SD-layout model root,
    with the CLIP config discovered from the subfolder's config.json."""
    from .models.clip_text import CLIPTextModel
    from .models.convert import (
        clip_config_from_dir,
        convert_clip_text,
        load_torch_state_dict_dir,
    )

    te_dir = os.path.join(pretrained_root, subfolder)
    cfg = clip_config_from_dir(te_dir)
    text_encoder = CLIPTextModel(cfg, **({"dtype": dtype} if dtype else {}))
    text_params = convert_clip_text(
        load_torch_state_dict_dir(te_dir), num_layers=cfg.num_hidden_layers
    )
    tokenizer = None
    if tokenizer_subfolder is not None:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(pretrained_root, tokenizer_subfolder)
        )
    return text_encoder, text_params, tokenizer


def load_vae_tower(pretrained_root: str, subfolder: str = "vae", dtype=None):
    """(vae, vae_params) from an SD-layout model root."""
    from .models.convert import convert_vae, load_torch_state_dict, vae_config_from_dir
    from .models.vae import AutoencoderKL

    vae_dir = os.path.join(pretrained_root, subfolder)
    cfg = vae_config_from_dir(vae_dir)
    vae = AutoencoderKL(cfg, **({"dtype": dtype} if dtype else {}))
    for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
        p = os.path.join(vae_dir, name)
        if os.path.exists(p):
            sd = load_torch_state_dict(p)
            break
    else:
        raise FileNotFoundError(f"no VAE weights under {vae_dir}")
    vae_params = convert_vae(
        sd, block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
    )
    return vae, vae_params
