"""HF-torch -> Flax weight converters for the frozen towers and the U-Net.

The reference loads everything with ``from_pretrained`` (trainer.py:2126-2176);
here the same HF checkpoints (torch state dicts / safetensors) are converted
once, host-side, into the NHWC/param-transposed Flax trees:

- Linear:   torch [out, in]      -> kernel [in, out]
- Conv2d:   torch [out, in, h, w]-> kernel [h, w, in, out]
- Norms:    weight/bias          -> scale/bias
- Embedding: weight              -> embedding
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .unet_spec import UNetSpec


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd, p):
    out = {"kernel": _np(sd[p + ".weight"]).T}
    if p + ".bias" in sd:
        out["bias"] = _np(sd[p + ".bias"])
    return out


def _conv(sd, p):
    out = {"kernel": _np(sd[p + ".weight"]).transpose(2, 3, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _np(sd[p + ".bias"])
    return out


def _norm(sd, p):
    return {"scale": _np(sd[p + ".weight"]), "bias": _np(sd[p + ".bias"])}


def _embed(sd, p):
    return {"embedding": _np(sd[p + ".weight"])}


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def convert_clip_text(sd: Dict, num_layers: int = 23) -> Dict:
    sd = {k.removeprefix("text_model."): v for k, v in sd.items()}
    params = {
        "token_embedding": _embed(sd, "embeddings.token_embedding"),
        "position_embedding": _np(sd["embeddings.position_embedding.weight"]),
        "final_layer_norm": _norm(sd, "final_layer_norm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": _linear(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "layer_norm1": _norm(sd, f"{p}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{p}.layer_norm2"),
            "mlp_fc1": _linear(sd, f"{p}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{p}.mlp.fc2"),
        }
    if "text_projection.weight" in sd:  # CLIPTextModelWithProjection (SDXL enc 2)
        params["text_projection"] = {"kernel": _np(sd["text_projection.weight"]).T}
    return params


# ---------------------------------------------------------------------------
# T5 encoder (Flux text tower)
# ---------------------------------------------------------------------------

def convert_t5_encoder(sd: Dict, num_layers: int) -> Dict:
    """HF T5EncoderModel state dict -> models/t5.py tree (no biases; RMSNorm
    has weight only)."""
    sd = {k.removeprefix("encoder."): v for k, v in sd.items()}
    params = {
        "token_embedding": {"embedding": _np(sd.get("shared.weight", sd.get("embed_tokens.weight")))},
        "relative_attention_bias": _embed(
            sd, "block.0.layer.0.SelfAttention.relative_attention_bias"
        ),
        "final_layer_norm": {"weight": _np(sd["final_layer_norm.weight"])},
    }
    for i in range(num_layers):
        p = f"block.{i}.layer"
        params[f"block_{i}"] = {
            "attn": {
                "q": _linear(sd, f"{p}.0.SelfAttention.q"),
                "k": _linear(sd, f"{p}.0.SelfAttention.k"),
                "v": _linear(sd, f"{p}.0.SelfAttention.v"),
                "o": _linear(sd, f"{p}.0.SelfAttention.o"),
            },
            "attn_norm": {"weight": _np(sd[f"{p}.0.layer_norm.weight"])},
            "wi_0": _linear(sd, f"{p}.1.DenseReluDense.wi_0"),
            "wi_1": _linear(sd, f"{p}.1.DenseReluDense.wi_1"),
            "wo": _linear(sd, f"{p}.1.DenseReluDense.wo"),
            "ff_norm": {"weight": _np(sd[f"{p}.1.layer_norm.weight"])},
        }
    return params


# ---------------------------------------------------------------------------
# MPNet
# ---------------------------------------------------------------------------

def convert_mpnet(sd: Dict, num_layers: int = 12) -> Dict:
    sd = {k.removeprefix("mpnet."): v for k, v in sd.items()}
    params = {
        "word_embeddings": _embed(sd, "embeddings.word_embeddings"),
        "position_embeddings": _embed(sd, "embeddings.position_embeddings"),
        "embeddings_norm": _norm(sd, "embeddings.LayerNorm"),
        "relative_attention_bias": _embed(sd, "encoder.relative_attention_bias"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "q": _linear(sd, f"{p}.attention.attn.q"),
                "k": _linear(sd, f"{p}.attention.attn.k"),
                "v": _linear(sd, f"{p}.attention.attn.v"),
                "o": _linear(sd, f"{p}.attention.attn.o"),
            },
            "attention_norm": _norm(sd, f"{p}.attention.LayerNorm"),
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "output_norm": _norm(sd, f"{p}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resnet(sd, p, has_shortcut):
    out = {
        "norm1": _norm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _norm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _vae_attention(sd, p):
    if p + ".to_q.weight" in sd:  # modern diffusers naming
        names = ("to_q", "to_k", "to_v")
        out_name = "to_out.0"
    else:  # legacy naming
        names = ("query", "key", "value")
        out_name = "proj_attn"
    q, k, v = (_linear(sd, f"{p}.{n}") for n in names)
    return {
        "group_norm": _norm(sd, p + ".group_norm"),
        "to_q": q,
        "to_k": k,
        "to_v": v,
        "to_out_0": _linear(sd, f"{p}.{out_name}"),
    }


def convert_vae(sd: Dict, block_out_channels=(128, 256, 512, 512), layers_per_block=2) -> Dict:
    n = len(block_out_channels)
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid_block": {
            "resnets_0": _vae_resnet(sd, "encoder.mid_block.resnets.0", False),
            "attentions_0": _vae_attention(sd, "encoder.mid_block.attentions.0"),
            "resnets_1": _vae_resnet(sd, "encoder.mid_block.resnets.1", False),
        },
    }
    prev = block_out_channels[0]
    for i, ch in enumerate(block_out_channels):
        for j in range(layers_per_block):
            has_sc = (j == 0 and prev != ch)
            enc[f"down_blocks_{i}_resnets_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", has_sc
            )
        if i < n - 1:
            enc[f"down_blocks_{i}_downsampler"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
        prev = ch

    rev = tuple(reversed(block_out_channels))
    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid_block": {
            "resnets_0": _vae_resnet(sd, "decoder.mid_block.resnets.0", False),
            "attentions_0": _vae_attention(sd, "decoder.mid_block.attentions.0"),
            "resnets_1": _vae_resnet(sd, "decoder.mid_block.resnets.1", False),
        },
    }
    prev = rev[0]
    for i, ch in enumerate(rev):
        for j in range(layers_per_block + 1):
            has_sc = (j == 0 and prev != ch)
            dec[f"up_blocks_{i}_resnets_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", has_sc
            )
        if i < n - 1:
            dec[f"up_blocks_{i}_upsampler"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        prev = ch

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# SD U-Net
# ---------------------------------------------------------------------------

def _unet_resnet(sd, p, use_shortcut):
    out = {
        "norm1": _norm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "time_emb_proj": _linear(sd, p + ".time_emb_proj"),
        "norm2": _norm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if use_shortcut:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _unet_attention(sd, p):
    return {
        "to_q": _linear(sd, p + ".to_q"),
        "to_k": _linear(sd, p + ".to_k"),
        "to_v": _linear(sd, p + ".to_v"),
        "to_out_0": _linear(sd, p + ".to_out.0"),
    }


def _unet_transformer(sd, p, use_linear_projection, num_layers=1):
    proj = _linear if use_linear_projection else _conv
    out = {
        "norm": _norm(sd, p + ".norm"),
        "proj_in": proj(sd, p + ".proj_in"),
        "proj_out": proj(sd, p + ".proj_out"),
    }
    for li in range(num_layers):
        tb = f"{p}.transformer_blocks.{li}"
        out[f"transformer_blocks_{li}"] = {
            "norm1": _norm(sd, tb + ".norm1"),
            "attn1": _unet_attention(sd, tb + ".attn1"),
            "norm2": _norm(sd, tb + ".norm2"),
            "attn2": _unet_attention(sd, tb + ".attn2"),
            "norm3": _norm(sd, tb + ".norm3"),
            "ff": {
                "net_0": {"proj": _linear(sd, tb + ".ff.net.0.proj")},
                "net_2": _linear(sd, tb + ".ff.net.2"),
            },
        }
    return out


def convert_unet(sd: Dict, spec: UNetSpec) -> Dict:
    """Load SD U-Net weights (full, unpruned) into the spec-driven tree.
    Mirrors UNet2DConditionModelGated.from_pretrained (reference
    unet_2d_conditional.py:1731+) — the gated graph shares the plain model's
    weights; gates have no parameters."""
    use_lp = any(t.use_linear_projection for b in spec.blocks for t in b.transformers)
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:  # SDXL text_time conditioning
        params["add_embedding"] = {
            "linear_1": _linear(sd, "add_embedding.linear_1"),
            "linear_2": _linear(sd, "add_embedding.linear_2"),
        }

    def block_params(block, prefix):
        bp = {}
        for j, r in enumerate(block.resnets):
            bp[f"resnets_{j}"] = _unet_resnet(sd, f"{prefix}.resnets.{j}", r.use_shortcut)
        for j, t in enumerate(block.transformers):
            bp[f"attentions_{j}"] = _unet_transformer(
                sd, f"{prefix}.attentions.{j}", use_lp, t.num_layers
            )
        if block.add_sampler:
            if block.kind == "down":
                bp["downsamplers_0"] = {"conv": _conv(sd, f"{prefix}.downsamplers.0.conv")}
            else:
                bp["upsamplers_0"] = {"conv": _conv(sd, f"{prefix}.upsamplers.0.conv")}
        return bp

    for i, b in enumerate(spec.down):
        params[f"down_blocks_{i}"] = block_params(b, f"down_blocks.{i}")
    params["mid_block"] = block_params(spec.mid, "mid_block")
    for i, b in enumerate(spec.up):
        params[f"up_blocks_{i}"] = block_params(b, f"up_blocks.{i}")
    return params


# ---------------------------------------------------------------------------
# Flux transformer
# ---------------------------------------------------------------------------

def _rms(sd, p):
    return {"scale": _np(sd[p + ".weight"])}


def convert_flux(sd: Dict, cfg) -> Dict:
    """HF diffusers ``FluxTransformer2DModel`` state dict -> models/flux.py
    ``GatedFluxTransformer2DModel`` params.

    The reference loads Flux-dev with ``from_pretrained`` into its gated
    subclass (pdm/training/trainer.py:1604-1729); the gated graph shares the
    plain model's weights (gates are parameterless), so the diffusers naming
    is the contract: joint blocks ``transformer_blocks.{i}`` carry
    norm1/norm1_context AdaLN-Zero linears, dual-stream attention
    (to_q/k/v + add_{q,k,v}_proj with RMS norm_q/k and norm_added_q/k,
    to_out.0 / to_add_out) and ff/ff_context; single blocks
    ``single_transformer_blocks.{i}`` carry norm.linear, proj_mlp, attn
    q/k/v + RMS norms, and the fused proj_out over [attn, mlp]
    (pdm/models/transformers/transformer_flux.py:22-306).
    """
    params: Dict = {
        "x_embedder": _linear(sd, "x_embedder"),
        "context_embedder": _linear(sd, "context_embedder"),
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": _linear(sd, "time_text_embed.timestep_embedder.linear_1"),
                "linear_2": _linear(sd, "time_text_embed.timestep_embedder.linear_2"),
            },
            "text_embedder": {
                "linear_1": _linear(sd, "time_text_embed.text_embedder.linear_1"),
                "linear_2": _linear(sd, "time_text_embed.text_embedder.linear_2"),
            },
        },
        "norm_out_linear": _linear(sd, "norm_out.linear"),
        "proj_out": _linear(sd, "proj_out"),
    }
    if cfg.guidance_embeds:
        params["time_text_embed"]["guidance_embedder"] = {
            "linear_1": _linear(sd, "time_text_embed.guidance_embedder.linear_1"),
            "linear_2": _linear(sd, "time_text_embed.guidance_embedder.linear_2"),
        }
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        params[f"transformer_blocks_{i}"] = {
            "norm1": {"linear": _linear(sd, f"{p}.norm1.linear")},
            "norm1_context": {"linear": _linear(sd, f"{p}.norm1_context.linear")},
            "attn": {
                "to_q": _linear(sd, f"{p}.attn.to_q"),
                "to_k": _linear(sd, f"{p}.attn.to_k"),
                "to_v": _linear(sd, f"{p}.attn.to_v"),
                "norm_q": _rms(sd, f"{p}.attn.norm_q"),
                "norm_k": _rms(sd, f"{p}.attn.norm_k"),
                "add_q_proj": _linear(sd, f"{p}.attn.add_q_proj"),
                "add_k_proj": _linear(sd, f"{p}.attn.add_k_proj"),
                "add_v_proj": _linear(sd, f"{p}.attn.add_v_proj"),
                "norm_added_q": _rms(sd, f"{p}.attn.norm_added_q"),
                "norm_added_k": _rms(sd, f"{p}.attn.norm_added_k"),
                "to_out_0": _linear(sd, f"{p}.attn.to_out.0"),
                "to_add_out": _linear(sd, f"{p}.attn.to_add_out"),
            },
            "ff": {
                "net_0_proj": _linear(sd, f"{p}.ff.net.0.proj"),
                "net_2": _linear(sd, f"{p}.ff.net.2"),
            },
            "ff_context": {
                "net_0_proj": _linear(sd, f"{p}.ff_context.net.0.proj"),
                "net_2": _linear(sd, f"{p}.ff_context.net.2"),
            },
        }
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        params[f"single_transformer_blocks_{i}"] = {
            "norm": {"linear": _linear(sd, f"{p}.norm.linear")},
            "proj_mlp": _linear(sd, f"{p}.proj_mlp"),
            "to_q": _linear(sd, f"{p}.attn.to_q"),
            "to_k": _linear(sd, f"{p}.attn.to_k"),
            "to_v": _linear(sd, f"{p}.attn.to_v"),
            "norm_q": _rms(sd, f"{p}.attn.norm_q"),
            "norm_k": _rms(sd, f"{p}.attn.norm_k"),
            "proj_out": _linear(sd, f"{p}.proj_out"),
        }
    return params


def flux_config_from_dir(flux_dir: str, default=None):
    """Build a FluxConfig from an HF diffusers transformer dir's config.json
    (what the reference gets implicitly via ``from_pretrained``,
    pdm/training/trainer.py:1604-1630)."""
    import json
    import os

    from .flux import FluxConfig

    path = os.path.join(flux_dir, "config.json")
    if not os.path.exists(path):
        return default if default is not None else FluxConfig()
    with open(path) as f:
        raw = json.load(f)
    fields = (
        "patch_size", "in_channels", "num_layers", "num_single_layers",
        "attention_head_dim", "num_attention_heads", "joint_attention_dim",
        "pooled_projection_dim", "guidance_embeds",
    )
    kw = {k: raw[k] for k in fields if k in raw and raw[k] is not None}
    if raw.get("axes_dims_rope"):
        kw["axes_dims_rope"] = tuple(raw["axes_dims_rope"])
    return FluxConfig(**kw)


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch .bin / .safetensors state dict from disk (host-side)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def load_torch_state_dict_dir(path: str) -> Dict:
    """Load a model dir's state dict: single-file or sharded-index layouts
    (T5-XXL ships as model-0000x-of-0000y.safetensors + index json)."""
    import json
    import os

    for idx_name in (
        "model.safetensors.index.json",
        "pytorch_model.bin.index.json",
        "diffusion_pytorch_model.safetensors.index.json",  # Flux-dev transformer
    ):
        idx = os.path.join(path, idx_name)
        if os.path.exists(idx):
            with open(idx) as f:
                index = json.load(f)
            sd: Dict = {}
            for shard in sorted(set(index["weight_map"].values())):
                sd.update(load_torch_state_dict(os.path.join(path, shard)))
            return sd
    for name in ("model.safetensors", "pytorch_model.bin",
                 "diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return load_torch_state_dict(p)
    raise FileNotFoundError(f"no model weights under {path}")


# ---------------------------------------------------------------------------
# Model-root config discovery
# ---------------------------------------------------------------------------

def clip_config_from_dir(te_dir: str, default=None):
    """Build a CLIPTextConfig from an HF text_encoder dir's config.json —
    what the reference gets implicitly from ``from_pretrained``
    (pdm/training/trainer.py:2139-2141). Falls back to ``default``
    (SD-2.1) when the dir has no config.json."""
    import json
    import os

    from .clip_text import CLIPTextConfig

    path = os.path.join(te_dir, "config.json")
    if not os.path.exists(path):
        return default if default is not None else CLIPTextConfig()
    with open(path) as f:
        raw = json.load(f)
    fields = (
        "vocab_size", "hidden_size", "num_hidden_layers", "num_attention_heads",
        "intermediate_size", "max_position_embeddings", "hidden_act",
        "layer_norm_eps", "eos_token_id",
    )
    kw = {k: raw[k] for k in fields if k in raw}
    # projection_dim appears in every HF CLIP config; only WithProjection
    # checkpoints actually carry text_projection weights
    if "CLIPTextModelWithProjection" in (raw.get("architectures") or []):
        kw["projection_dim"] = raw.get("projection_dim") or 0
    return CLIPTextConfig(**kw)


def vae_config_from_dir(vae_dir: str, default=None):
    """Build a VAEConfig from an HF diffusers vae dir's config.json."""
    import json
    import os

    from .vae import VAEConfig

    path = os.path.join(vae_dir, "config.json")
    if not os.path.exists(path):
        return default if default is not None else VAEConfig()
    with open(path) as f:
        raw = json.load(f)
    fields = (
        "in_channels", "out_channels", "latent_channels", "layers_per_block",
        "norm_num_groups", "scaling_factor", "shift_factor",
    )
    kw = {k: raw[k] for k in fields if k in raw and raw[k] is not None}
    if "block_out_channels" in raw:
        kw["block_out_channels"] = tuple(raw["block_out_channels"])
    return VAEConfig(**kw)
