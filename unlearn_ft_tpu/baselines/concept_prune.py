"""ConceptPrune — training-free skilled-neuron pruning (Wanda).

Reference: baselines/concept_prune/wanda.py:31-120 + neuron_receivers/
wanda_receiver.py + remove_neurons.py: record GEGLU FFN activations on base
vs target prompts, score neurons with |W| * ||act||, take the top
``skill_ratio`` neurons whose target-score exceeds their base-score, and zero
their output rows.

TPU-native: activations come from flax capture_intermediates on the GEGLU
gate output (no hooks); masks are applied as a pure params transform.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet_spec import UNetSpec


def _ffn_filter(mdl, method_name):
    from ..models.attention import GEGLU

    return isinstance(mdl, GEGLU) and method_name == "__call__"


def collect_ffn_activations(
    unet, params: Dict, sample, timesteps, context, structure=None
) -> Dict[str, np.ndarray]:
    """Run the U-Net once, returning mean |activation| per FFN neuron, keyed
    by the GEGLU module path."""
    _, state = unet.apply(
        {"params": params}, sample, timesteps, context, structure,
        capture_intermediates=lambda mdl, name: type(mdl).__name__ == "GEGLU",
        mutable=["intermediates"],
    )

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "__call__" in tree:
                act = tree["__call__"][0]  # [B, L, inner]
                out["/".join(path)] = np.asarray(
                    jnp.abs(act).mean(axis=(0, 1))
                )
            else:
                for k, v in tree.items():
                    walk(v, path + [k])

    walk(state["intermediates"], [])
    return out


def wanda_masks(
    params: Dict,
    spec: UNetSpec,
    base_acts: Dict[str, np.ndarray],
    target_acts: Dict[str, np.ndarray],
    skill_ratio: float = 0.01,
) -> Dict[str, np.ndarray]:
    """Per-FFN boolean masks (True = remove neuron): neurons whose Wanda
    score on the target concept exceeds the base score, top skill_ratio."""
    masks = {}
    for path, t_act in target_acts.items():
        b_act = base_acts[path]
        # locate the GEGLU's following net_2 kernel: path ends .../ff/net_0
        parts = path.split("/")
        node = params
        for p in parts[:-1]:  # into .../ff
            node = node[p]
        w2 = np.asarray(node["net_2"]["kernel"])  # [inner, dim]
        w_norm = np.abs(w2).sum(axis=1)  # |W| per input neuron
        score_t = w_norm * t_act
        score_b = w_norm * b_act
        diff = score_t - score_b
        k = max(1, int(skill_ratio * diff.shape[0]))
        thresh = np.partition(diff, -k)[-k]
        masks[path] = (diff >= thresh) & (score_t > score_b)
    return masks


def union_masks(mask_list: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Union masks over timesteps (reference save_union_over_time.py)."""
    out = {}
    for masks in mask_list:
        for k, v in masks.items():
            out[k] = v | out.get(k, np.zeros_like(v))
    return out


def apply_neuron_masks(params: Dict, masks: Dict[str, np.ndarray]) -> Dict:
    """Zero the masked neurons' contribution (remove_neurons.py): the GEGLU
    proj columns (both halves) are zeroed so the neuron never activates."""
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    for path, mask in masks.items():
        parts = path.split("/")
        node = params
        for p in parts:  # into .../ff/net_0
            node = node[p]
        kern = node["proj"]["kernel"]
        inner = kern.shape[1] // 2
        col = np.concatenate([mask, mask])
        kern[:, col] = 0.0
        if "bias" in node["proj"]:
            node["proj"]["bias"][col] = 0.0
    return params
