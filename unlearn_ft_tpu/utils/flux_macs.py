"""Analytic MACs for the gated Flux transformer (parity with
GatedFluxTransformerBlock/SingleBlock.calc_macs + get_prunable_macs,
pdm/models/transformers/transformer_flux.py:102-145, 260-305)."""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.flux import FluxConfig
from ..utils.arch import GateLayout, Structure
from ..utils.estimation import hard_concrete


def flux_macs(cfg: FluxConfig, l_img: int, l_txt: int) -> Dict:
    d = cfg.inner_dim
    L = l_img + l_txt
    mlp = int(d * cfg.mlp_ratio)

    # joint block
    qkv_h = 3 * l_img * d * d
    qkv_c = 3 * l_txt * d * d
    attn_mm = 2 * L * L * d
    out_proj = (l_img + l_txt) * d * d
    joint_attn = qkv_h + qkv_c + attn_mm + out_proj
    joint_ff = l_img * (d * mlp + mlp * d)
    joint_ff_ctx = l_txt * (d * mlp + mlp * d)
    joint_norms = (l_img + l_txt) * d * 2 + 2 * d * 6 * d  # LNs + adaLN linears
    joint = {
        "per_gate": (float(joint_attn), float(joint_ff), float(joint_ff_ctx)),
        "prunable": float(joint_attn + joint_ff + joint_ff_ctx),
        "total": float(joint_attn + joint_ff + joint_ff_ctx + joint_norms),
    }

    # single block
    s_qkv = 3 * L * d * d
    s_attn_mm = 2 * L * L * d
    s_attn = s_qkv + s_attn_mm
    s_mlp = L * d * mlp
    s_out = L * (d + mlp) * d
    s_norms = L * d + d * 3 * d
    # the shared ff_gate prunes mlp+proj_out; attn head gate prunes s_attn
    single = {
        "per_gate": (float(s_attn), float(s_mlp + s_out)),
        "prunable": float(s_attn + s_mlp + s_out),
        "total": float(s_attn + s_mlp + s_out + s_norms),
    }

    fixed = (
        l_img * cfg.in_channels * d  # x_embedder
        + l_txt * cfg.joint_attention_dim * d  # context_embedder
        + 3 * (256 * d + d * d)  # time/text/guidance embedders
        + 2 * d * d + l_img * d * cfg.patch_size**2 * cfg.in_channels  # norm_out+proj_out
    )
    total = (
        fixed + cfg.num_layers * joint["total"] + cfg.num_single_layers * single["total"]
    )
    prunable = cfg.num_layers * joint["prunable"] + cfg.num_single_layers * single["prunable"]
    per_submodule_prunable: List[List[float]] = (
        [list(joint["per_gate"]) for _ in range(cfg.num_layers)]
        + [list(single["per_gate"]) for _ in range(cfg.num_single_layers)]
    )
    return {
        "total": float(total),
        "prunable": float(prunable),
        "fixed": float(fixed),
        "joint": joint,
        "single": single,
        "per_submodule_prunable": per_submodule_prunable,
    }


def flux_calc_macs(
    cfg: FluxConfig,
    layout: GateLayout,
    structure: Optional[Structure],
    l_img: int,
    l_txt: int,
    static_table: Optional[Dict] = None,
) -> Dict:
    table = static_table or flux_macs(cfg, l_img, l_txt)
    if structure is None:
        return dict(table, cur_prunable=jnp.asarray([table["prunable"]]),
                    cur_total=jnp.asarray([table["total"]]))
    batch = structure.width[0].shape[0]
    cur_p = jnp.zeros((batch,))
    cur_t = jnp.full((batch,), table["fixed"])
    w = list(structure.width)

    def ratio(g):
        return hard_concrete(g).mean(axis=1)

    for i in range(cfg.num_layers):
        a, f, fc = table["joint"]["per_gate"]
        r_attn, r_ff, r_ffc = ratio(w.pop(0)), ratio(w.pop(0)), ratio(w.pop(0))
        cur_p = cur_p + r_attn * a + r_ff * f + r_ffc * fc
        cur_t = cur_t + (
            jax.lax.stop_gradient(r_attn) * a
            + jax.lax.stop_gradient(r_ff) * f
            + jax.lax.stop_gradient(r_ffc) * fc
            + (table["joint"]["total"] - table["joint"]["prunable"])
        )
    for i in range(cfg.num_single_layers):
        a, f = table["single"]["per_gate"]
        r_attn, r_ff = ratio(w.pop(0)), ratio(w.pop(0))
        cur_p = cur_p + r_attn * a + r_ff * f
        cur_t = cur_t + (
            jax.lax.stop_gradient(r_attn) * a
            + jax.lax.stop_gradient(r_ff) * f
            + (table["single"]["total"] - table["single"]["prunable"])
        )
    assert not w
    return dict(table, cur_prunable=cur_p, cur_total=cur_t)
