"""T5 encoder in Flax (Flux's second text tower, T5-XXL v1.1).

Replaces the reference's transformers.T5EncoderModel usage (FluxPruner
init_models, pdm/training/trainer.py:1604-1740, prompt encoding :1700-1720);
weights convert from the HF torch checkpoint via convert.convert_t5_encoder.

T5 specifics honored here: RMSNorm (no mean subtraction, weight only),
bias-free projections, no query scaling (folded into init), a single
relative-position bias table owned by block 0 and shared by every layer,
gated-gelu feed-forward (v1.1 / XXL).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


class T5LayerNorm(nn.Module):
    """RMSNorm: x / rms(x) * weight, computed in fp32."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * (var + self.epsilon) ** -0.5
        return (y * w).astype(self.dtype)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Bidirectional bucket mapping (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


class T5Attention(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask_bias):
        c = self.cfg
        b, l, _ = x.shape
        inner = c.num_heads * c.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q, k, v = (
            t.reshape(b, l, c.num_heads, c.d_kv).transpose(0, 2, 1, 3) for t in (q, k, v)
        )
        # no 1/sqrt(d) scaling — T5 folds it into initialization
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores + position_bias + mask_bias
        probs = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask_bias):
        c = self.cfg
        h = T5LayerNorm(c.layer_norm_epsilon, self.dtype, name="attn_norm")(x)
        x = x + T5Attention(c, self.dtype, name="attn")(h, position_bias, mask_bias)
        h = T5LayerNorm(c.layer_norm_epsilon, self.dtype, name="ff_norm")(x)
        g = nn.gelu(
            nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h),
            approximate=True,
        )
        h = g * nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x


class T5EncoderModel(nn.Module):
    cfg: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask=None) -> jnp.ndarray:
        c = self.cfg
        b, l = input_ids.shape
        x = nn.Embed(c.vocab_size, c.d_model, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = jnp.arange(l)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )  # [l, l]
        bias = nn.Embed(
            c.relative_attention_num_buckets, c.num_heads, dtype=jnp.float32,
            name="relative_attention_bias",
        )(buckets)  # [l, l, h]
        position_bias = bias.transpose(2, 0, 1)[None]  # [1, h, l, l]
        if attention_mask is not None:
            mask_bias = jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
            )
        else:
            mask_bias = jnp.zeros((b, 1, 1, l), jnp.float32)
        for i in range(c.num_layers):
            x = T5Block(c, self.dtype, name=f"block_{i}")(x, position_bias, mask_bias)
        return T5LayerNorm(c.layer_norm_epsilon, self.dtype, name="final_layer_norm")(x)
