"""Spec-driven SD U-Net in Flax (NHWC), with pruning gates as forward inputs.

TPU-first redesign of the reference's gated/pruned U-Net family
(pdm/models/unet/unet_2d_conditional.py:627-2495, pdm/models/unet/blocks.py):

- one module tree reads a static ``UNetSpec`` — the full gated model and any
  materialized expert are the same code with different specs/params;
- gate values arrive as a ``Structure`` pytree argument (from the
  hypernet/quantizer or a fixed arch vector), so switching experts never
  recompiles;
- depth gates are residual lerps ``(1-g)*x + g*f(x)`` (gates.py:43-49);
  dropped layers are *absent* from the pruned spec (identity wiring), giving
  XLA a statically smaller graph instead of masked dead compute.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.arch import Structure
from .attention import BasicTransformerBlock
from .layers import (
    Downsample2D,
    GroupNormSiLU,
    TimestepEmbedding,
    Upsample2D,
    broadcast_gate,
    expand_group_gate,
    timestep_embedding,
)
from .unet_spec import BlockSpec, ResnetSpec, TransformerSpec, UNetSpec


def _lerp_depth(gate: jnp.ndarray, x_in: jnp.ndarray, x_out: jnp.ndarray) -> jnp.ndarray:
    g = broadcast_gate(gate, x_out.shape[0])[:, None, None, None].astype(x_out.dtype)
    return (1.0 - g) * x_in + g * x_out


class ResnetBlock2D(nn.Module):
    """GN-SiLU-Conv x2 with time embedding; width gate after conv1+temb,
    before norm2 (ResnetBlock2DWidthGated.forward, blocks.py:308-381)."""

    spec: ResnetSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray,
        width_gate: Optional[jnp.ndarray] = None,
        depth_gate: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        s = self.spec
        if s.is_input_concatenated and (s.has_depth_gate or s.dropped):
            # concat layout is [hidden, skip] along channels; the depth-gated
            # residual is the hidden part only (blocks.py:502-510)
            x_res = x[..., : x.shape[-1] - s.skip_channels]
        else:
            x_res = x
        if s.dropped:
            return x_res

        h = GroupNormSiLU(s.norm1_groups, s.eps, self.dtype, name="norm1")(x)
        h = nn.Conv(
            s.hidden_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1"
        )(h)
        t = nn.Dense(s.hidden_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]

        if width_gate is not None and s.has_width_gate:
            m = expand_group_gate(
                broadcast_gate(width_gate, h.shape[0]), s.hidden_channels
            )[:, None, None, :].astype(h.dtype)
            h = h * m

        h = GroupNormSiLU(s.norm2_groups, s.eps, self.dtype, name="norm2")(h)
        h = nn.Conv(
            s.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2"
        )(h)

        shortcut = x
        if s.use_shortcut:
            shortcut = nn.Conv(s.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        out = shortcut + h

        if depth_gate is not None and s.has_depth_gate:
            out = _lerp_depth(depth_gate, x_res, out)
        return out


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in -> BasicTransformerBlock -> proj_out (+residual),
    with an optional depth-gate lerp around the whole module
    (Transformer2DModelWidthDepthGated, blocks.py:1006-1335)."""

    spec: TransformerSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        gates: Tuple = ((None, None, None),),  # per-layer (attn1, attn2, ff) gates
        depth_gate: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        s = self.spec
        if s.dropped:
            return x
        b, hgt, wid, c = x.shape
        residual = x
        inner = s.in_channels  # proj keeps the full inner dim; only heads shrink

        h = nn.GroupNorm(s.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if s.use_linear_projection:
            h = h.reshape(b, hgt * wid, c)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(b, hgt * wid, inner)

        if len(gates) != s.num_layers:
            gates = ((None, None, None),) * s.num_layers
        for li in range(s.num_layers):
            h = BasicTransformerBlock(
                dim=inner,
                heads=s.heads[li],
                heads2=s.heads2[li],
                head_dim=s.head_dim,
                ff_inner=s.ff_inner[li],
                ff_gate_width=s.ff_gate_width,
                upcast_attention=s.upcast_attention,
                dtype=self.dtype,
                name=f"transformer_blocks_{li}",
            )(h, encoder_hidden_states, *gates[li])

        if s.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hgt, wid, c)
        else:
            h = h.reshape(b, hgt, wid, inner)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        out = h + residual

        if depth_gate is not None and s.has_depth_gate:
            out = _lerp_depth(depth_gate, residual, out)
        return out


def _consume_gates(block: BlockSpec, structure: Optional[Structure]):
    """Assign the block's Structure slices to submodules in canonical order
    (all resnets first, then all attentions — blocks.py:1710-1727; per
    transformer: per-layer [attn1, attn2, ff] triples)."""
    n_res, n_tf = len(block.resnets), len(block.transformers)
    res_gates = [(None, None)] * n_res
    tf_gates = [(((None, None, None),) * (t.num_layers or 1), None) for t in block.transformers]
    if structure is None:
        return res_gates, tf_gates
    w, d = list(structure.width), list(structure.depth)
    for j, r in enumerate(block.resnets):
        wg = w.pop(0) if r.has_width_gate else None
        dg = d.pop(0) if r.has_depth_gate else None
        res_gates[j] = (wg, dg)
    for j, t in enumerate(block.transformers):
        layers = []
        for _ in range(t.num_layers):
            if t.has_width_gates:
                g1, g2 = w.pop(0), w.pop(0)
                gff = w.pop(0) if t.gated_ff else None
            else:
                g1 = g2 = gff = None
            layers.append((g1, g2, gff))
        dg = d.pop(0) if t.has_depth_gate else None
        tf_gates[j] = (tuple(layers), dg)
    assert not w and not d, "block structure not fully consumed"
    return res_gates, tf_gates


class DownBlock2D(nn.Module):
    spec: BlockSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, temb, encoder_hidden_states, structure: Optional[Structure]):
        res_gates, tf_gates = _consume_gates(self.spec, structure)
        outputs: List[jnp.ndarray] = []
        for j, rspec in enumerate(self.spec.resnets):
            h = ResnetBlock2D(rspec, self.dtype, name=f"resnets_{j}")(h, temb, *res_gates[j])
            if self.spec.has_cross_attention:
                h = Transformer2DModel(self.spec.transformers[j], self.dtype, name=f"attentions_{j}")(
                    h, encoder_hidden_states, *tf_gates[j]
                )
            outputs.append(h)
        if self.spec.add_sampler:
            h = Downsample2D(self.spec.sampler_out_channels, self.dtype, name="downsamplers_0")(h)
            outputs.append(h)
        return h, outputs


class UpBlock2D(nn.Module):
    spec: BlockSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, res_states, temb, encoder_hidden_states, structure: Optional[Structure]):
        res_gates, tf_gates = _consume_gates(self.spec, structure)
        for j, rspec in enumerate(self.spec.resnets):
            skip = res_states.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResnetBlock2D(rspec, self.dtype, name=f"resnets_{j}")(h, temb, *res_gates[j])
            if self.spec.has_cross_attention:
                h = Transformer2DModel(self.spec.transformers[j], self.dtype, name=f"attentions_{j}")(
                    h, encoder_hidden_states, *tf_gates[j]
                )
        if self.spec.add_sampler:
            h = Upsample2D(self.spec.sampler_out_channels, self.dtype, name="upsamplers_0")(h)
        return h


class MidBlock2DCrossAttn(nn.Module):
    spec: BlockSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, temb, encoder_hidden_states, structure: Optional[Structure]):
        res_gates, tf_gates = _consume_gates(self.spec, structure)
        h = ResnetBlock2D(self.spec.resnets[0], self.dtype, name="resnets_0")(
            h, temb, *res_gates[0]
        )
        h = Transformer2DModel(self.spec.transformers[0], self.dtype, name="attentions_0")(
            h, encoder_hidden_states, *tf_gates[0]
        )
        h = ResnetBlock2D(self.spec.resnets[1], self.dtype, name="resnets_1")(
            h, temb, *res_gates[1]
        )
        return h


class UNet2DConditionModel(nn.Module):
    """The denoiser. ``structure=None`` runs the materialized/plain net;
    passing a Structure (split per the GateLayout) applies soft/hard gates.

    Inputs are NHWC: sample [B, H, W, C_lat]; encoder_hidden_states
    [B, L, D_text]; timesteps [B].
    """

    spec: UNetSpec
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize per-block activations on backward
    # (replaces the reference's enable/disable of torch gradient_checkpointing,
    # trainer.py config training.gradient_checkpointing)
    remat_policy: Optional[str] = None
    # What remat saves vs recomputes (only read when remat=True):
    #   None    - save nothing per block; backward replays the whole block
    #             forward (~+1 student fwd of recompute FLOPs per step)
    #   "dots"  - jax.checkpoint_policies.dots_saveable: matmul/attention
    #             outputs are saved, only elementwise/norm/conv work replays
    #   "hires" - full remat ONLY on the highest-resolution down/up blocks
    #             (the big activations); inner blocks save everything

    def _block(self, cls, hires: bool = False):
        if not self.remat:
            return cls
        if self.remat_policy is None:
            return nn.remat(cls, static_argnums=(), prevent_cse=False)
        if self.remat_policy == "dots":
            return nn.remat(
                cls, static_argnums=(), prevent_cse=False,
                policy=jax.checkpoint_policies.dots_saveable,
            )
        if self.remat_policy == "hires":
            if not hires:
                return cls
            return nn.remat(cls, static_argnums=(), prevent_cse=False)
        raise ValueError(f"unknown remat_policy {self.remat_policy!r}")

    def split_structure(self, structure: Optional[Structure]) -> List[Optional[Structure]]:
        if structure is None:
            return [None] * len(self.spec.blocks)
        out = []
        wi, di = 0, 0
        for block in self.spec.blocks:
            nw = sum(
                1 for r in block.resnets if r.has_width_gate
            ) + sum(
                (3 if t.gated_ff else 2) * t.num_layers
                for t in block.transformers
                if t.has_width_gates
            )
            nd = sum(1 for r in block.resnets if r.has_depth_gate) + sum(
                1 for t in block.transformers if t.has_depth_gate
            )
            out.append(
                Structure(
                    width=tuple(structure.width[wi : wi + nw]),
                    depth=tuple(structure.depth[di : di + nd]),
                )
            )
            wi += nw
            di += nd
        assert wi == len(structure.width) and di == len(structure.depth), (
            "structure does not match spec gate counts"
        )
        return out

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        structure: Optional[Structure] = None,
        return_block_activations: bool = False,
        added_cond: Optional[dict] = None,  # SDXL: {'text_embeds', 'time_ids'}
    ):
        """When ``return_block_activations``, also returns the per-block
        output dict {'d0'..,'m','u0'..} used by the block-distillation loss —
        the TPU-native stand-in for the reference's forward hooks
        (cast_block_act_hooks, trainer.py:557-572)."""
        s = self.spec
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        per_block = self.split_structure(structure)

        t_emb = timestep_embedding(
            timesteps, s.block_out_channels[0], s.flip_sin_to_cos, s.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(s.time_embed_dim, self.dtype, name="time_embedding")(t_emb)

        if s.addition_embed_type == "text_time":
            # SDXL micro-conditioning: size/crop time_ids + pooled text embeds
            assert added_cond is not None, "SDXL spec requires added_cond"
            time_ids = added_cond["time_ids"]  # [B, 6]
            t_flat = timestep_embedding(
                time_ids.reshape(-1), s.addition_time_embed_dim, s.flip_sin_to_cos,
                s.freq_shift,
            ).reshape(time_ids.shape[0], -1)
            aug = jnp.concatenate(
                [added_cond["text_embeds"], t_flat.astype(self.dtype)], axis=-1
            )
            temb = temb + TimestepEmbedding(
                s.time_embed_dim, self.dtype, name="add_embedding"
            )(aug)

        h = nn.Conv(
            s.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_in",
        )(sample)

        block_acts = {}
        res_stack: List[jnp.ndarray] = [h]
        bi = 0
        mid_cls = self._block(MidBlock2DCrossAttn)
        for i, block in enumerate(s.down):
            # "hires" = the top two resolution levels, where activations
            # dominate HBM (64x64 and 32x32 at 512px)
            down_cls = self._block(DownBlock2D, hires=i < 2)
            h, outputs = down_cls(block, self.dtype, name=f"down_blocks_{i}")(
                h, temb, encoder_hidden_states, per_block[bi]
            )
            res_stack.extend(outputs)
            block_acts[f"d{i}"] = h
            bi += 1

        h = mid_cls(s.mid, self.dtype, name="mid_block")(
            h, temb, encoder_hidden_states, per_block[bi]
        )
        block_acts["m"] = h
        bi += 1

        for i, block in enumerate(s.up):
            n = len(block.resnets)
            skips, res_stack = res_stack[-n:], res_stack[:-n]
            up_cls = self._block(UpBlock2D, hires=i >= len(s.up) - 2)
            h = up_cls(block, self.dtype, name=f"up_blocks_{i}")(
                h, list(skips), temb, encoder_hidden_states, per_block[bi]
            )
            block_acts[f"u{i}"] = h
            bi += 1

        h = GroupNormSiLU(s.norm_num_groups, 1e-5, self.dtype, name="conv_norm_out")(h)
        h = nn.Conv(
            s.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out"
        )(h)
        if return_block_activations:
            return h, block_acts
        return h
