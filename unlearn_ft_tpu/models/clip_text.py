"""CLIP text encoder in Flax (SD-2.1's OpenCLIP ViT-H text tower as shipped
in HF format: hidden 1024, 23 layers, 16 heads, gelu).

Replaces the reference's transformers.CLIPTextModel usage
(pdm/training/trainer.py:2136-2144); weights convert from the HF torch
checkpoint via convert.convert_clip_text. Output is last_hidden_state (what
SD conditions on) plus the EOS-pooled embedding.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # SD-2.1; SD-1.x/CLIP ViT-L uses quick_gelu
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    # SDXL text_encoder_2 (CLIPTextModelWithProjection): pooled output runs
    # through a bias-free text_projection
    projection_dim: int = 0


def sdxl_text_encoder_config() -> CLIPTextConfig:
    """SDXL text_encoder (CLIP ViT-L/14)."""
    return CLIPTextConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, hidden_act="quick_gelu",
    )


def sdxl_text_encoder_2_config() -> CLIPTextConfig:
    """SDXL text_encoder_2 (OpenCLIP ViT-bigG/14 text tower)."""
    return CLIPTextConfig(
        hidden_size=1280, num_hidden_layers=32, num_attention_heads=20,
        intermediate_size=5120, hidden_act="gelu", projection_dim=1280,
    )


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, l, d = x.shape
        h, hd = c.num_attention_heads, d // c.num_attention_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (t.reshape(b, l, h, hd).transpose(0, 2, 1, 3) for t in (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + causal_mask
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, penultimate: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """Returns (last_hidden_state, pooled) — pooled runs through
        text_projection when ``projection_dim`` is set — plus, when
        ``penultimate``, the hidden state after layer N-1 without the final
        layer norm (what SDXL conditions on: hidden_states[-2],
        diffusers StableDiffusionXLPipeline.encode_prompt)."""
        c = self.cfg
        b, l = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :l, :].astype(tok.dtype)

        causal = jnp.triu(jnp.full((l, l), jnp.finfo(jnp.float32).min), k=1)[None, None]
        penult = None
        for i in range(c.num_hidden_layers):
            if i == c.num_hidden_layers - 1:
                penult = x
            x = CLIPEncoderLayer(c, self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)

        # pooled = hidden state at the EOS token (highest id per row for CLIP)
        eos_idx = jnp.argmax((input_ids == c.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_idx]
        if c.projection_dim:
            pooled = nn.Dense(
                c.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        if penultimate:
            return x, pooled, penult
        return x, pooled
