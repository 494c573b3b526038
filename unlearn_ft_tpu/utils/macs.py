"""Analytic MACs accounting for the spec-driven U-Net.

Replaces the reference's hook-based op counter + per-module calc_macs
(pdm/utils/op_counter.py:23-600, blocks.py calc_macs methods,
unet_2d_conditional.py:2123-2162): with static shapes the counts are closed
form, and the *current* (gated) counts are differentiable functions of the
gates via the hard-concrete STE — exactly what the resource loss needs.

Formula parity (per submodule, reference calc_macs):
  width-only resnet:  cur_prunable = r * P
  width+depth resnet: cur_prunable = (r*P + (T-P)) * d
  transformer:        cur_prunable = (sum_sub cur_prunable + T-P) * d
with r = mean(hard_concrete(width gate)), d = hard_concrete(depth gate).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.unet_spec import BlockSpec, ResnetSpec, TransformerSpec, UNetSpec
from ..utils.arch import Structure
from ..utils.estimation import hard_concrete


@dataclass(frozen=True)
class SubmoduleMacs:
    prunable: float
    total: float
    per_gate_prunable: Tuple[float, ...]  # one entry per width gate


def resnet_macs(s: ResnetSpec, res: int, time_embed_dim: int) -> SubmoduleMacs:
    hw = res * res
    conv1 = hw * 9 * s.in_channels * s.hidden_channels
    temb = time_embed_dim * s.hidden_channels
    norm1 = hw * s.in_channels
    norm2 = hw * s.hidden_channels
    conv2 = hw * 9 * s.hidden_channels * s.out_channels
    shortcut = hw * s.in_channels * s.out_channels if s.use_shortcut else 0
    prunable = conv1 + temb + norm2 + conv2
    total = prunable + norm1 + shortcut
    return SubmoduleMacs(float(prunable), float(total), (float(prunable),))


def transformer_macs(s: TransformerSpec, res: int, seq_kv: int = 77) -> SubmoduleMacs:
    L = res * res
    C = s.in_channels
    per_gate = []
    prunable = 0.0
    total = L * C + 2 * L * C * C  # group norm + proj_in/out
    for li in range(s.num_layers):
        inner1 = s.heads[li] * s.head_dim
        inner2 = s.heads2[li] * s.head_dim
        # self-attention (attn1): q,k,v + out projections + score/value matmuls
        attn1 = 3 * L * C * inner1 + L * inner1 * C + 2 * L * L * inner1
        # cross-attention (attn2)
        attn2 = (
            L * C * inner2 + 2 * seq_kv * s.cross_attention_dim * inner2
            + L * inner2 * C + 2 * L * seq_kv * inner2
        )
        ff = L * C * (2 * s.ff_inner[li]) + L * s.ff_inner[li] * C
        per_gate += [float(attn1), float(attn2), float(ff)]
        prunable += attn1 + attn2 + ff
        total += attn1 + attn2 + ff + 3 * L * C  # + layer norms
    return SubmoduleMacs(float(prunable), float(total), tuple(per_gate))


def sampler_macs(block: BlockSpec, res: int) -> float:
    c = block.sampler_out_channels
    if block.kind == "down":
        return float((res // 2) * (res // 2) * 9 * c * c)
    return float((2 * res) * (2 * res) * 9 * c * c)


def _block_resolution(spec: UNetSpec) -> List[int]:
    """Input resolution of each block in canonical order (down..mid..up)."""
    res = spec.sample_size
    out = []
    for b in spec.down:
        out.append(res)
        if b.add_sampler:
            res //= 2
    out.append(res)  # mid
    for b in spec.up:
        out.append(res)
        if b.add_sampler:
            res *= 2
    return out


def unet_macs(spec: UNetSpec, seq_kv: int = 77) -> Dict:
    """Static per-submodule MACs table + totals for a given spec."""
    resolutions = _block_resolution(spec)
    per_block = []
    prunable_list: List[List[float]] = []  # per submodule, per gate (quantizer template)
    total = prunable = 0.0
    # conv_in/out + time embedding
    hw = spec.sample_size**2
    c0 = spec.block_out_channels[0]
    fixed = hw * 9 * spec.in_channels * c0 + hw * 9 * c0 * spec.out_channels + hw * c0
    fixed += c0 * spec.time_embed_dim + spec.time_embed_dim**2
    total += fixed
    for res, block in zip(resolutions, spec.blocks):
        subs = []
        for r in block.resnets:
            m = resnet_macs(r, res, spec.time_embed_dim)
            subs.append(m)
        for t in block.transformers:
            subs.append(transformer_macs(t, res, seq_kv))
        for m in subs:
            total += m.total
            prunable += m.prunable
            prunable_list.append(list(m.per_gate_prunable))
        if block.add_sampler:
            total += sampler_macs(block, res)
        per_block.append(subs)
    return {
        "total": total,
        "prunable": prunable,
        "per_block": per_block,
        "per_submodule_prunable": prunable_list,
        "fixed": fixed,
        "resolutions": resolutions,
    }


def calc_macs(
    spec: UNetSpec,
    structure: Optional[Structure],
    seq_kv: int = 77,
    static_table: Optional[Dict] = None,
) -> Dict:
    """Current (gated) MACs as differentiable [B]-vectors, mirroring
    UNet2DConditionModelGated.calc_macs aggregation
    (unet_2d_conditional.py:2123-2162)."""
    table = static_table or unet_macs(spec, seq_kv)
    if structure is None:
        b = 1
        cur_prunable = jnp.full((b,), table["prunable"])
        cur_total = jnp.full((b,), table["total"])
        return dict(table, cur_prunable=cur_prunable, cur_total=cur_total)

    batch = structure.width[0].shape[0] if structure.width else 1
    cur_prunable = jnp.zeros((batch,))
    cur_total = jnp.full((batch,), table["fixed"])
    w_iter = list(structure.width)
    d_iter = list(structure.depth)

    def ratio(gate):
        return hard_concrete(gate).mean(axis=1)

    for bi, block in enumerate(spec.blocks):
        subs = table["per_block"][bi]
        res = table["resolutions"][bi]
        si = 0
        for r in block.resnets:
            m = subs[si]
            si += 1
            rr = ratio(w_iter.pop(0)) if r.has_width_gate else jnp.ones((batch,))
            cp = rr * m.prunable
            ct = jax.lax.stop_gradient(rr) * m.prunable + (m.total - m.prunable)
            if r.has_depth_gate:
                dd = hard_concrete(d_iter.pop(0))
                cp = (cp + (m.total - m.prunable)) * dd
                ct = ct * jax.lax.stop_gradient(dd)
            cur_prunable = cur_prunable + cp
            cur_total = cur_total + ct
        for t in block.transformers:
            m = subs[si]
            si += 1
            cp = jnp.zeros((batch,))
            ct = jnp.zeros((batch,))
            for li in range(t.num_layers):
                if t.has_width_gates:
                    r1 = ratio(w_iter.pop(0))
                    r2 = ratio(w_iter.pop(0))
                    rff = ratio(w_iter.pop(0)) if t.gated_ff else jnp.ones((batch,))
                else:
                    r1 = r2 = rff = jnp.ones((batch,))
                a1, a2, ff = m.per_gate_prunable[3 * li : 3 * li + 3]
                cp = cp + r1 * a1 + r2 * a2 + (rff * ff if t.gated_ff else ff)
                ct = ct + (
                    jax.lax.stop_gradient(r1) * a1
                    + jax.lax.stop_gradient(r2) * a2
                    + (jax.lax.stop_gradient(rff) * ff if t.gated_ff else ff)
                )
            ct = ct + (m.total - m.prunable)
            if t.has_depth_gate:
                dd = hard_concrete(d_iter.pop(0))
                cp = (cp + (m.total - m.prunable)) * dd
                ct = ct * jax.lax.stop_gradient(dd)
            cur_prunable = cur_prunable + cp
            cur_total = cur_total + ct
        if block.add_sampler:
            cur_total = cur_total + sampler_macs(block, res)
    assert not w_iter and not d_iter, "structure not fully consumed by calc_macs"
    return dict(table, cur_prunable=cur_prunable, cur_total=cur_total)
