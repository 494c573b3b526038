"""AutoencoderKL (SD VAE) in Flax, NHWC.

Replaces the reference's diffusers AutoencoderKL (frozen; encode on the hot
training path at pdm/training/trainer.py:2405-2406, decode in the sampling
pipelines). Weights convert from the HF torch checkpoint via
convert.convert_vae.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import GroupNormSiLU


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0  # Flux VAE: 0.1159 (z = (z - shift) * scale)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNormSiLU(self.groups, 1e-6, self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNormSiLU(self.groups, 1e-6, self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        scores = jnp.einsum("bqd,bkd->bqk", q, k) / (c**0.5)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkd->bqd", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(b, hh, ww, c)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VAEResnet(self.channels, self.groups, self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, self.dtype, name="attentions_0")(x)
        return VAEResnet(self.channels, self.groups, self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = VAEResnet(ch, c.norm_num_groups, self.dtype,
                              name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(c.block_out_channels) - 1:
                # diffusers pads (0,1,0,1) and convolves stride 2 w/o padding
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                            name=f"down_blocks_{i}_downsampler")(h)
        h = VAEMidBlock(c.block_out_channels[-1], c.norm_num_groups, self.dtype, name="mid_block")(h)
        h = GroupNormSiLU(c.norm_num_groups, 1e-6, self.dtype, name="conv_norm_out")(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        rev = tuple(reversed(c.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        h = VAEMidBlock(rev[0], c.norm_num_groups, self.dtype, name="mid_block")(h)
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                h = VAEResnet(ch, c.norm_num_groups, self.dtype,
                              name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"up_blocks_{i}_upsampler")(h)
        h = GroupNormSiLU(c.norm_num_groups, 1e-6, self.dtype, name="conv_norm_out")(h)
        return nn.Conv(c.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """pixels [-1,1] NHWC -> (mean, logvar) of the latent distribution."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng):
        """Sample latents (already scaled by scaling_factor — what the
        training step consumes, trainer.py:2405-2406)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return (z - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, z):
        z = z / self.cfg.scaling_factor + self.cfg.shift_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        z = self.encode(x, rng)
        return self.decode(z)
