"""Attention and feed-forward modules with head-level / neuron-level pruning
gates.

TPU-first redesign of the reference's HeadGatedAttnProcessor2 / GatedAttention
(pdm/models/unet/blocks.py:141-296) and FeedForwardWidthGated/GEGLUGated
(blocks.py:27-139): gates are forward-pass *inputs* (mask multiplication),
not module state, so a single compiled graph serves every expert; the hard
path (pruned head/neuron counts) is a different static spec, not a branch.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import broadcast_gate, expand_group_gate


class Attention(nn.Module):
    """Multi-head attention (self or cross) with optional per-head gating.

    heads/head_dim describe the *materialized* size (pruned models simply
    carry fewer heads); ``head_gate`` is a [b, heads] soft mask applied to
    q/k/v before the attention kernel, matching blocks.py:267-272.
    """

    heads: int
    head_dim: int
    out_dim: int
    upcast_attention: bool = False
    use_memory_efficient: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, Lq, C]
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        head_gate: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        inner = self.heads * self.head_dim
        b, lq, _ = hidden_states.shape
        lk = context.shape[1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        q = q.reshape(b, lq, self.heads, self.head_dim)
        k = k.reshape(b, lk, self.heads, self.head_dim)
        v = v.reshape(b, lk, self.heads, self.head_dim)

        if head_gate is not None:
            g = broadcast_gate(head_gate, b).astype(q.dtype)[:, None, :, None]
            q, k, v = q * g, k * g, v * g

        out = dot_product_attention(
            q, k, v, upcast=self.upcast_attention, use_memory_efficient=self.use_memory_efficient
        )
        out = out.reshape(b, lq, inner).astype(hidden_states.dtype)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    """GEGLU activation with optional grouped neuron gating
    (GEGLUGated, blocks.py:27-76). ``inner_dim`` is the materialized width."""

    inner_dim: int
    gate_width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, neuron_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        proj = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        if neuron_gate is not None:
            m = expand_group_gate(broadcast_gate(neuron_gate, x.shape[0]), self.inner_dim)
            m = m[:, None, :].astype(h.dtype)
            h, gate = h * m, gate * m
        return h * nn.gelu(gate, approximate=False)


class GELU(nn.Module):
    """Gated plain-GELU activation (GatedGELU, activations.py:8-56;
    ``approximate='tanh'`` selects the tanh form)."""

    inner_dim: int
    gate_width: int = 32
    approximate: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, neuron_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="proj")(x)
        h = nn.gelu(h, approximate=self.approximate == "tanh")
        if neuron_gate is not None:
            m = expand_group_gate(broadcast_gate(neuron_gate, x.shape[0]), self.inner_dim)
            h = h * m[:, None, :].astype(h.dtype)
        return h


class ApproximateGELU(nn.Module):
    """Gated sigmoid-approximate GELU ``x * sigmoid(1.702 x)``
    (GatedApproximateGELU, activations.py)."""

    inner_dim: int
    gate_width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, neuron_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="proj")(x)
        h = h * nn.sigmoid(1.702 * h)
        if neuron_gate is not None:
            m = expand_group_gate(broadcast_gate(neuron_gate, x.shape[0]), self.inner_dim)
            h = h * m[:, None, :].astype(h.dtype)
        return h


class SwiGLU(nn.Module):
    """Gated SwiGLU: like GEGLU but with SiLU on the gate half
    (GatedSwiGLU, activations.py)."""

    inner_dim: int
    gate_width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, neuron_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        proj = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        if neuron_gate is not None:
            m = expand_group_gate(broadcast_gate(neuron_gate, x.shape[0]), self.inner_dim)
            m = m[:, None, :].astype(h.dtype)
            h, gate = h * m, gate * m
        return h * nn.silu(gate)


# activation_fn values follow the reference's GatedFeedForward switch
# (pdm/models/attention.py; diffusers FeedForward activation_fn names)
_FF_ACTIVATIONS = {
    "geglu": lambda inner, gw, dt: GEGLU(inner, gw, dtype=dt, name="net_0"),
    "gelu": lambda inner, gw, dt: GELU(inner, gw, dtype=dt, name="net_0"),
    "gelu-approximate": lambda inner, gw, dt: GELU(
        inner, gw, approximate="tanh", dtype=dt, name="net_0"
    ),
    "swiglu": lambda inner, gw, dt: SwiGLU(inner, gw, dtype=dt, name="net_0"),
}


class FeedForward(nn.Module):
    """Gated FF (GatedFeedForward). SD/SDXL specs always use geglu (what the
    analytic MACs accounting assumes); the other activations are the
    reference's parity surface for non-SD diffusers models."""

    dim_out: int
    inner_dim: int
    gate_width: int = 32
    activation_fn: str = "geglu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, neuron_gate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        act = _FF_ACTIVATIONS[self.activation_fn](self.inner_dim, self.gate_width, self.dtype)
        h = act(x, neuron_gate)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """LN -> gated self-attn -> LN -> gated cross-attn -> LN -> gated FF,
    each with residual (BasicTransformerBlockWidthGated, blocks.py:705-867)."""

    dim: int
    heads: int
    head_dim: int
    ff_inner: int
    heads2: Optional[int] = None  # cross-attn heads (pruned independently)
    ff_gate_width: int = 32
    upcast_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        attn1_gate: Optional[jnp.ndarray] = None,
        attn2_gate: Optional[jnp.ndarray] = None,
        ff_gate: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(hidden_states)
        h = Attention(
            self.heads,
            self.head_dim,
            self.dim,
            upcast_attention=self.upcast_attention,
            dtype=self.dtype,
            name="attn1",
        )(h, None, attn1_gate)
        hidden_states = h + hidden_states

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(hidden_states)
        h = Attention(
            self.heads if self.heads2 is None else self.heads2,
            self.head_dim,
            self.dim,
            upcast_attention=self.upcast_attention,
            dtype=self.dtype,
            name="attn2",
        )(h, encoder_hidden_states, attn2_gate)
        hidden_states = h + hidden_states

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(hidden_states)
        h = FeedForward(self.dim, self.ff_inner, self.ff_gate_width, dtype=self.dtype, name="ff")(
            h, ff_gate
        )
        return h + hidden_states
