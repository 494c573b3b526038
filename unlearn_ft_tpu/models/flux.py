"""Gated Flux (MMDiT) transformer in Flax.

TPU-native rebuild of the reference GatedFluxTransformer2DModel
(pdm/models/transformers/transformer_flux.py:22-452) + its gated attention/FF
(pdm/models/attention.py:115-330): joint MMDiT blocks + single DiT blocks,
RoPE over (t, h, w) axes, AdaLayerNormZero conditioning, with

- per-block head gates masking q/k/v of BOTH streams (attention.py:148-176),
- FF neuron-group gates (GatedFeedForward / the single-block shared ff_gate
  that masks both the MLP hidden and the attention output,
  transformer_flux.py:73-80),
- no depth gates (commented out in the reference).

Gate layout (canonical order): joint blocks then single blocks;
joint widths = [heads, ff, ff_context], single widths = [heads, ff].
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..utils.arch import BlockGates, GateLayout, Structure, SubmoduleGates
from .layers import broadcast_gate, expand_group_gate, timestep_embedding


def _attention_bhld(q, k, v):
    """[B, H, L, D] attention through the shared kernel dispatch.

    Routes Flux's joint/single attention (seq = txt+img tokens, e.g. 1536 at
    512px with T5-512) to the Pallas splash/flash kernels on TPU; the BLHD
    transposes cancel against the wrappers' internal layout moves under XLA.
    fp32 softmax matches the reference's upcast
    (pdm/models/attention.py:170-176).
    """
    out = dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        upcast=True,
    )
    return out.transpose(0, 2, 1, 3)


@dataclass(frozen=True)
class FluxConfig:
    patch_size: int = 1
    in_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    ff_gate_width: int = 32
    mlp_ratio: float = 4.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


def flux_gate_layout(cfg: FluxConfig) -> GateLayout:
    h, gw = cfg.num_attention_heads, cfg.ff_gate_width
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append(BlockGates("FluxJoint", (SubmoduleGates("flux_joint", (h, gw, gw), 0),)))
    for _ in range(cfg.num_single_layers):
        blocks.append(BlockGates("FluxSingle", (SubmoduleGates("flux_single", (h, gw), 0),)))
    return GateLayout(tuple(blocks))


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_frequencies(ids: jnp.ndarray, axes_dims, theta: float = 10000.0):
    """ids [B, L, n_axes] -> (cos, sin) each [B, L, sum(dims)//2]."""
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(axes_dims):
        pos = ids[..., i].astype(jnp.float32)
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        angles = pos[..., None] * freqs[None, None, :]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, H, L, D] with D = 2 * cos.shape[-1]; rotate interleaved pairs."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (x * scale).astype(self.dtype)


# ---------------------------------------------------------------------------
# Conditioning embeddings
# ---------------------------------------------------------------------------

class MLPEmbedder(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(nn.silu(x))


class TimeTextEmbed(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep, pooled, guidance=None):
        t_emb = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0.0)
        emb = MLPEmbedder(self.cfg.inner_dim, self.dtype, name="timestep_embedder")(
            t_emb.astype(self.dtype)
        )
        if self.cfg.guidance_embeds:
            g_emb = timestep_embedding(guidance, 256, flip_sin_to_cos=True,
                                       downscale_freq_shift=0.0)
            emb = emb + MLPEmbedder(self.cfg.inner_dim, self.dtype, name="guidance_embedder")(
                g_emb.astype(self.dtype)
            )
        emb = emb + MLPEmbedder(self.cfg.inner_dim, self.dtype, name="text_embedder")(pooled)
        return emb


class AdaLayerNormZero(nn.Module):
    dim: int
    n_params: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        p = nn.Dense(self.n_params * self.dim, dtype=self.dtype, name="linear")(nn.silu(emb))
        parts = jnp.split(p[:, None, :], self.n_params, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x)
        shift, scale = parts[0], parts[1]
        return h * (1 + scale) + shift, parts[2:]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class FluxJointAttention(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context, rope_cs, head_gate=None):
        c = self.cfg
        H, D = c.num_attention_heads, c.attention_head_dim
        b, li, _ = hidden.shape
        lt = context.shape[1]

        def proj(x, name):
            return nn.Dense(H * D, dtype=self.dtype, name=name)(x).reshape(
                x.shape[0], x.shape[1], H, D
            ).transpose(0, 2, 1, 3)

        q = RMSNorm(D, dtype=self.dtype, name="norm_q")(proj(hidden, "to_q"))
        k = RMSNorm(D, dtype=self.dtype, name="norm_k")(proj(hidden, "to_k"))
        v = proj(hidden, "to_v")
        cq = RMSNorm(D, dtype=self.dtype, name="norm_added_q")(proj(context, "add_q_proj"))
        ck = RMSNorm(D, dtype=self.dtype, name="norm_added_k")(proj(context, "add_k_proj"))
        cv = proj(context, "add_v_proj")

        if head_gate is not None:
            g = broadcast_gate(head_gate, b).astype(q.dtype)[:, :, None, None]
            q, k, v = q * g, k * g, v * g
            cq, ck, cv = cq * g, ck * g, cv * g

        # joint sequence: [context; hidden]
        q = jnp.concatenate([cq, q], axis=2)
        k = jnp.concatenate([ck, k], axis=2)
        v = jnp.concatenate([cv, v], axis=2)
        cos, sin = rope_cs
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        out = _attention_bhld(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lt + li, H * D)
        ctx_out, hid_out = out[:, :lt], out[:, lt:]
        hid_out = nn.Dense(c.inner_dim, dtype=self.dtype, name="to_out_0")(hid_out)
        ctx_out = nn.Dense(c.inner_dim, dtype=self.dtype, name="to_add_out")(ctx_out)
        return hid_out, ctx_out


class GatedFluxFeedForward(nn.Module):
    dim: int
    inner_dim: int
    gate_width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, neuron_gate=None):
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="net_0_proj")(x)
        h = nn.gelu(h, approximate=True)
        if neuron_gate is not None:
            m = expand_group_gate(broadcast_gate(neuron_gate, x.shape[0]), self.inner_dim)
            h = h * m[:, None, :].astype(h.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class FluxTransformerBlock(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context, temb, rope_cs, gates=(None, None, None)):
        c = self.cfg
        head_gate, ff_gate, ff_ctx_gate = gates
        norm_h, (gate_msa, shift_mlp, scale_mlp, gate_mlp) = AdaLayerNormZero(
            c.inner_dim, 6, self.dtype, name="norm1"
        )(hidden, temb)
        norm_c, (c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp) = AdaLayerNormZero(
            c.inner_dim, 6, self.dtype, name="norm1_context"
        )(context, temb)

        attn_out, ctx_attn_out = FluxJointAttention(c, self.dtype, name="attn")(
            norm_h, norm_c, rope_cs, head_gate
        )
        hidden = hidden + gate_msa * attn_out
        norm_h2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                               dtype=self.dtype, name="norm2")(hidden)
        norm_h2 = norm_h2 * (1 + scale_mlp) + shift_mlp
        ff_out = GatedFluxFeedForward(
            c.inner_dim, int(c.inner_dim * c.mlp_ratio), c.ff_gate_width, self.dtype, name="ff"
        )(norm_h2, ff_gate)
        hidden = hidden + gate_mlp * ff_out

        context = context + c_gate_msa * ctx_attn_out
        norm_c2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                               dtype=self.dtype, name="norm2_context")(context)
        norm_c2 = norm_c2 * (1 + c_scale_mlp) + c_shift_mlp
        ff_ctx = GatedFluxFeedForward(
            c.inner_dim, int(c.inner_dim * c.mlp_ratio), c.ff_gate_width, self.dtype,
            name="ff_context",
        )(norm_c2, ff_ctx_gate)
        context = context + c_gate_mlp * ff_ctx
        return hidden, context


class FluxSingleTransformerBlock(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, rope_cs, gates=(None, None)):
        c = self.cfg
        head_gate, ff_gate = gates
        H, D = c.num_attention_heads, c.attention_head_dim
        b, l, _ = x.shape
        mlp_dim = int(c.inner_dim * c.mlp_ratio)

        residual = x
        norm_x, (gate,) = AdaLayerNormZero(c.inner_dim, 3, self.dtype, name="norm")(x, temb)
        mlp = nn.gelu(
            nn.Dense(mlp_dim, dtype=self.dtype, name="proj_mlp")(norm_x), approximate=True
        )
        if ff_gate is not None:
            m = expand_group_gate(broadcast_gate(ff_gate, b), mlp_dim)
            mlp = mlp * m[:, None, :].astype(mlp.dtype)

        def proj(name):
            return nn.Dense(H * D, dtype=self.dtype, name=name)(norm_x).reshape(
                b, l, H, D
            ).transpose(0, 2, 1, 3)

        q = RMSNorm(D, dtype=self.dtype, name="norm_q")(proj("to_q"))
        k = RMSNorm(D, dtype=self.dtype, name="norm_k")(proj("to_k"))
        v = proj("to_v")
        if head_gate is not None:
            g = broadcast_gate(head_gate, b).astype(q.dtype)[:, :, None, None]
            q, k, v = q * g, k * g, v * g
        cos, sin = rope_cs
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attention_bhld(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, H * D)
        if ff_gate is not None:
            # the single-block shared ff_gate also masks the attention output
            # channel groups (transformer_flux.py:80)
            m = expand_group_gate(broadcast_gate(ff_gate, b), H * D)
            attn = attn * m[:, None, :].astype(attn.dtype)

        out = nn.Dense(c.inner_dim, dtype=self.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=2)
        )
        return residual + gate * out


class GatedFluxTransformer2DModel(nn.Module):
    cfg: FluxConfig = FluxConfig()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize per-block activations on backward
    # (training.gradient_checkpointing, same contract as models/unet.py)
    remat_policy: Optional[str] = None  # None = replay whole blocks;
    # "dots" = save matmul/attention outputs (jax dots_saveable)

    def _block(self, cls):
        if not self.remat:
            return cls
        if self.remat_policy is None:
            return nn.remat(cls, static_argnums=(), prevent_cse=False)
        if self.remat_policy == "dots":
            return nn.remat(
                cls, static_argnums=(), prevent_cse=False,
                policy=jax.checkpoint_policies.dots_saveable,
            )
        raise ValueError(f"unknown remat_policy {self.remat_policy!r}")

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, L_img, in_channels] packed latents
        encoder_hidden_states: jnp.ndarray,  # [B, L_txt, joint_attention_dim]
        pooled_projections: jnp.ndarray,  # [B, pooled_projection_dim]
        timestep: jnp.ndarray,  # [B] in [0, 1] (sigma*1000 applied here)
        img_ids: jnp.ndarray,  # [B, L_img, 3]
        txt_ids: jnp.ndarray,  # [B, L_txt, 3]
        guidance: Optional[jnp.ndarray] = None,
        structure: Optional[Structure] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        hidden = nn.Dense(c.inner_dim, dtype=self.dtype, name="x_embedder")(hidden_states)
        temb = TimeTextEmbed(c, self.dtype, name="time_text_embed")(
            timestep * 1000.0, pooled_projections,
            guidance * 1000.0 if guidance is not None else None,
        )
        context = nn.Dense(c.inner_dim, dtype=self.dtype, name="context_embedder")(
            encoder_hidden_states
        )

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        rope_cs = rope_frequencies(ids, c.axes_dims_rope)

        widths = list(structure.width) if structure is not None else None

        def pop(n):
            if widths is None:
                return (None,) * n
            out = tuple(widths[:n])
            del widths[:n]
            return out

        JointBlock = self._block(FluxTransformerBlock)
        SingleBlock = self._block(FluxSingleTransformerBlock)
        for i in range(c.num_layers):
            hidden, context = JointBlock(
                c, self.dtype, name=f"transformer_blocks_{i}"
            )(hidden, context, temb, rope_cs, pop(3))

        x = jnp.concatenate([context, hidden], axis=1)
        for i in range(c.num_single_layers):
            x = SingleBlock(
                c, self.dtype, name=f"single_transformer_blocks_{i}"
            )(x, temb, rope_cs, pop(2))
        if widths is not None:
            assert not widths, "flux structure not fully consumed"
        hidden = x[:, encoder_hidden_states.shape[1]:]

        # AdaLayerNormContinuous
        p = nn.Dense(2 * c.inner_dim, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(p[:, None, :], 2, axis=-1)
        hidden = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                              dtype=self.dtype, name="norm_out")(hidden)
        hidden = hidden * (1 + scale) + shift
        return nn.Dense(
            c.patch_size * c.patch_size * c.in_channels, dtype=self.dtype, name="proj_out"
        )(hidden)


# ---------------------------------------------------------------------------
# Latent packing helpers (FluxPipeline._pack_latents equivalents)
# ---------------------------------------------------------------------------

def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] NHWC -> [B, H/2*W/2, C*4] (2x2 patchify). The last dim is
    channel-major (C, 2, 2) to match diffusers FluxPipeline._pack_latents, so
    converted Flux transformer weights (x_embedder/proj_out) line up."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(packed: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, _, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h, w, c)


def make_image_ids(h: int, w: int, batch: int) -> np.ndarray:
    """[B, h/2*w/2, 3] (t=0, y, x) ids for RoPE."""
    ids = np.zeros((h // 2, w // 2, 3), np.float32)
    ids[..., 1] = np.arange(h // 2)[:, None]
    ids[..., 2] = np.arange(w // 2)[None, :]
    ids = ids.reshape(-1, 3)
    return np.broadcast_to(ids[None], (batch, ids.shape[0], 3)).copy()
