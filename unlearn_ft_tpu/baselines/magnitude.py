"""Magnitude pruning baseline (reference UNet2DConditionModelMagnitudePruned,
pdm/models/unet/unet_2d_conditional.py:2498-2928, BaselineUnetFineTuner
'magnitude', trainer.py:3489-3577).

Mechanism parity with the reference's torch_pruning setup
(unet_2d_conditional.py:2873-2920) without the torch_pruning dependency:

- tp builds a dependency graph and scores each prunable channel GROUP by
  aggregating weight magnitudes over every coupled layer
  (tp.importance.MagnitudeImportance: per-layer p-norm per channel ->
  group_reduction='mean' -> normalizer='mean'). Here the dependency groups
  are known statically from the gate structure, so each gated unit scores
  the same coupled set: a resnet channel group aggregates conv1-out +
  time_emb_proj-out + norm2-scale + conv2-in; an attention head aggregates
  to_q/to_k/to_v-out (the reference's explicit channel_groups,
  :2891-2895) + to_out-in.
- `ignored_layers` = [conv_out, every FeedForward] (:2884-2887): FF gates
  are never pruned (conv_out is not gated here to begin with), and the
  global ratio budget is taken over the prunable (non-FF) units only —
  matching tp's global_pruning over non-ignored layers.
- depth gates stay on: magnitude pruning removes widths, not layers.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..models.unet_spec import UNetSpec
from ..utils.arch import GateLayout


def _group_norms(w: np.ndarray, groups: int, axis: int) -> np.ndarray:
    """L2 norm per channel group along ``axis`` of a kernel."""
    w = np.moveaxis(np.asarray(w), axis, 0)
    w = w.reshape(groups, -1)
    return np.linalg.norm(w, axis=1)


def _group_importance(per_layer: List[np.ndarray]) -> np.ndarray:
    """tp.importance.MagnitudeImportance aggregation over a dependency
    group: mean of the per-layer channel norms, normalized by its mean."""
    s = np.mean(np.stack(per_layer), axis=0)
    return s / (np.mean(s) + 1e-9)


def magnitude_arch_vector(
    params: Dict, spec: UNetSpec, layout: GateLayout, ratio: float
) -> np.ndarray:
    """Global magnitude ranking -> soft arch vector (0.9 keep / 0.1 drop).
    ``ratio`` = kept fraction of the prunable (non-FF) units."""
    scores: List[np.ndarray] = []  # one array per width gate, canonical order
    prunable: List[bool] = []  # False for ignored (FF) gates

    def block_scores(block, bp):
        for j, r in enumerate(block.resnets):
            if not r.has_width_gate:
                continue
            rp = bp[f"resnets_{j}"]
            g = r.gate_width
            per_layer = [
                _group_norms(rp["conv1"]["kernel"], g, axis=3),  # [3,3,in,out]
                _group_norms(rp["time_emb_proj"]["kernel"], g, axis=1),  # [in,out]
                _group_norms(rp["norm2"]["scale"], g, axis=0),  # [out]
                _group_norms(rp["conv2"]["kernel"], g, axis=2),  # in-channels
            ]
            scores.append(_group_importance(per_layer))
            prunable.append(True)
        for j, t in enumerate(block.transformers):
            if not t.has_width_gates:
                continue
            for li in range(t.num_layers):
                tb = bp[f"attentions_{j}"][f"transformer_blocks_{li}"]
                for attn, heads in (("attn1", t.heads[li]), ("attn2", t.heads2[li])):
                    ap = tb[attn]
                    per_layer = [
                        _group_norms(ap["to_q"]["kernel"], heads, axis=1),  # [in, H*hd]
                        _group_norms(ap["to_k"]["kernel"], heads, axis=1),
                        _group_norms(ap["to_v"]["kernel"], heads, axis=1),
                        _group_norms(ap["to_out_0"]["kernel"], heads, axis=0),  # in-side
                    ]
                    scores.append(_group_importance(per_layer))
                    prunable.append(True)
                if t.gated_ff:
                    # reference ignored_layers: FeedForward modules are never
                    # pruned (unet_2d_conditional.py:2884-2887)
                    scores.append(np.full(t.ff_gate_width, np.inf, np.float32))
                    prunable.append(False)

    for i, b in enumerate(spec.down):
        block_scores(b, params[f"down_blocks_{i}"])
    block_scores(spec.mid, params["mid_block"])
    for i, b in enumerate(spec.up):
        block_scores(b, params[f"up_blocks_{i}"])

    assert len(scores) == len(layout.width_list), (len(scores), len(layout.width_list))
    flat = np.concatenate(scores)
    mask = np.concatenate([
        np.full(len(s), p) for s, p in zip(scores, prunable)
    ])
    pool = flat[mask]
    k = int(ratio * pool.shape[0])
    thresh = np.partition(pool, -k)[-k] if k > 0 else np.inf
    keep = np.where(mask, flat >= thresh, True)

    # never fully kill a gate group (reference force_width_non_zero semantics)
    out = np.where(keep, 0.9, 0.1).astype(np.float32)
    start = 0
    for w, s in zip(layout.width_list, scores):
        if not (out[start : start + w] > 0.5).any():
            out[start + int(np.argmax(s))] = 0.9
        start += w
    depth = np.full(layout.num_depth, 0.9, np.float32)
    return np.concatenate([out, depth])[None, :]
