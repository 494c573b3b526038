"""Magnitude pruning baseline (reference UNet2DConditionModelMagnitudePruned,
pdm/models/unet/unet_2d_conditional.py:2498-2928, BaselineUnetFineTuner
'magnitude', trainer.py:3489-3577).

The reference drives torch_pruning's MagnitudePruner over a dependency graph.
Here the same idea maps directly onto the gate structure: score every gated
unit (resnet channel group / attention head / FFN neuron group) by the L2
norm of its outgoing weights, rank globally, and keep the top ``ratio`` —
producing an arch vector consumed by the standard materializer. Depth gates
are kept on (magnitude pruning removes widths, not layers).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.unet_spec import UNetSpec
from ..utils.arch import GateLayout


def _group_norms(w: np.ndarray, groups: int, axis: int) -> np.ndarray:
    """L2 norm per channel group along ``axis`` of a kernel."""
    w = np.moveaxis(np.asarray(w), axis, 0)
    w = w.reshape(groups, -1)
    return np.linalg.norm(w, axis=1)


def magnitude_arch_vector(
    params: Dict, spec: UNetSpec, layout: GateLayout, ratio: float
) -> np.ndarray:
    """Global magnitude ranking -> soft arch vector (0.9 keep / 0.1 drop)."""
    scores = []  # one array per width gate, canonical order

    def block_scores(block, bp):
        for j, r in enumerate(block.resnets):
            if not r.has_width_gate:
                continue
            k = np.asarray(bp[f"resnets_{j}"]["conv1"]["kernel"])  # [3,3,in,out]
            s = _group_norms(k, r.gate_width, axis=3)
            scores.append(s / (np.linalg.norm(s) + 1e-9))
        for j, t in enumerate(block.transformers):
            if not t.has_width_gates:
                continue
            tb = bp[f"attentions_{j}"]["transformer_blocks_0"]
            for attn in ("attn1", "attn2"):
                q = np.asarray(tb[attn]["to_q"]["kernel"])  # [in, H*hd]
                s = _group_norms(q, t.heads if attn == "attn1" else t.heads2, axis=1)
                scores.append(s / (np.linalg.norm(s) + 1e-9))
            if t.gated_ff:
                p = np.asarray(tb["ff"]["net_0"]["proj"]["kernel"])  # [in, 2*inner]
                half = p[:, : p.shape[1] // 2]
                s = _group_norms(half, t.ff_gate_width, axis=1)
                scores.append(s / (np.linalg.norm(s) + 1e-9))

    for i, b in enumerate(spec.down):
        block_scores(b, params[f"down_blocks_{i}"])
    block_scores(spec.mid, params["mid_block"])
    for i, b in enumerate(spec.up):
        block_scores(b, params[f"up_blocks_{i}"])

    assert len(scores) == len(layout.width_list), (len(scores), len(layout.width_list))
    flat = np.concatenate(scores)
    k = int(ratio * flat.shape[0])
    thresh = np.partition(flat, -k)[-k] if k > 0 else np.inf
    keep = flat >= thresh

    # never fully kill a gate group (reference force_width_non_zero semantics)
    out = np.where(keep, 0.9, 0.1).astype(np.float32)
    start = 0
    for w in layout.width_list:
        if not (out[start : start + w] > 0.5).any():
            out[start + int(np.argmax(flat[start : start + w]))] = 0.9
        start += w
    depth = np.full(layout.num_depth, 0.9, np.float32)
    return np.concatenate([out, depth])[None, :]
