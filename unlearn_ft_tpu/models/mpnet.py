"""MPNet sentence encoder in Flax (all-mpnet-base-v2 backbone).

The reference feeds mean-pooled MPNet embeddings to the prompt hypernetwork
(pdm/utils/data_utils.py:231-244, encode_with_mpnet). This port reproduces
HF's MPNetModel forward: RoBERTa-style position ids (pad=1), post-norm
encoder layers, and a T5-style relative attention bias shared across layers.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    relative_attention_num_buckets: int = 32
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing (HF MPNetEncoder.relative_position_bucket)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(n.astype(np.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class MPNetSelfAttention(nn.Module):
    cfg: MPNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask_bias, position_bias):
        c = self.cfg
        b, l, d = x.shape
        h, hd = c.num_attention_heads, d // c.num_attention_heads
        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v")(x)
        q, k, v = (t.reshape(b, l, h, hd).transpose(0, 2, 1, 3) for t in (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (hd**0.5)
        scores = scores + position_bias + attn_mask_bias
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="o")(out)


class MPNetLayer(nn.Module):
    cfg: MPNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask_bias, position_bias):
        c = self.cfg
        attn = MPNetSelfAttention(c, self.dtype, name="attention")(
            x, attn_mask_bias, position_bias
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_norm")(
            x + attn
        )
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_norm")(x + h)


class MPNetModel(nn.Module):
    cfg: MPNetConfig = MPNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, l = input_ids.shape
        mask = attention_mask.astype(jnp.int32)
        # RoBERTa-style position ids: cumsum over non-pad + pad offset
        position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id

        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings"
        )(position_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_norm")(
            tok + pos
        )

        # shared relative attention bias
        rp = np.arange(l)[None, :] - np.arange(l)[:, None]
        buckets = jnp.asarray(
            relative_position_bucket(rp, c.relative_attention_num_buckets), jnp.int32
        )
        bias_table = nn.Embed(
            c.relative_attention_num_buckets,
            c.num_attention_heads,
            dtype=self.dtype,
            name="relative_attention_bias",
        )(buckets)  # [l, l, h]
        position_bias = bias_table.transpose(2, 0, 1)[None]  # [1, h, l, l]

        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
        for i in range(c.num_hidden_layers):
            x = MPNetLayer(c, self.dtype, name=f"layer_{i}")(x, attn_bias, position_bias)
        return x


def mean_pool(last_hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling (encode_with_mpnet, data_utils.py:231-238)."""
    m = attention_mask[..., None].astype(last_hidden.dtype)
    return (last_hidden * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9)
