"""Shared NHWC layers for diffusion backbones (timestep embeddings,
resampling). Functional equivalents of the diffusers layers the reference
builds on; NHWC layout is chosen for TPU conv efficiency.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding [B, dim] (SD defaults: flip, shift 0)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate(
        [sin, cos], axis=-1
    )
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class GroupNormSiLU(nn.Module):
    """GroupNorm fused with SiLU via ops.groupnorm.group_norm_silu (one HBM
    round trip on TPU; XLA-fused elsewhere). Param tree is identical to
    ``nn.GroupNorm`` (scale/bias), so converted/pruned weights drop in."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.groupnorm import group_norm_silu

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu(x, scale, bias, self.num_groups, self.epsilon)


class TimestepEmbedding(nn.Module):
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


def broadcast_gate(gate: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Tile a [b, ...] gate to match a possibly CFG-doubled batch (reference
    VirtualGate.forward, pdm/models/gates.py:24-27)."""
    if gate.shape[0] == batch:
        return gate
    assert batch % gate.shape[0] == 0, (gate.shape, batch)
    reps = (batch // gate.shape[0],) + (1,) * (gate.ndim - 1)
    return jnp.tile(gate, reps)


def expand_group_gate(gate: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[B, groups] 0..1 gate -> [B, channels] channel mask by repeating each
    group entry channels//groups times (VirtualGate repeat_interleave)."""
    b, g = gate.shape
    assert channels % g == 0, (channels, g)
    return jnp.repeat(gate, channels // g, axis=1)
