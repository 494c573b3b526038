"""Apply an erasure checkpoint overlay onto expert U-Net params (the
reference's --erasure_ckpt_path path, scripts/metrics/generate_fid_images.py:97-111).

Three accepted formats:
- this framework's ``.npz`` of flax param paths (save_overlay);
- ESD torch ``.pt``: ``{module_path: {'weight':…, 'bias':…}}`` with ``unet.``
  prefixes (FineTunedModel.state_dict, baselines/erasing/utils/utils.py:440-450);
- a flat diffusers-naming torch/safetensors state dict, full or partial
  (what UCE-edited models save) — generate_fid_images.py:100-111.

Torch keys are translated to flax paths generically (``blocks.0`` index
tokens fold into ``blocks_0``) and tensors are re-laid-out by target leaf:
linear ``[out,in]`` -> kernel ``[in,out]``, conv ``[o,i,h,w]`` -> ``[h,w,i,o]``,
norm weight -> scale.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..utils.logging_utils import logger


def _flatten_esd(sd: Dict) -> Dict:
    """ESD FineTunedModel nested dict -> flat {path.weight/bias: tensor}."""
    flat = {}
    for k, sub in sd.items():
        k = k.removeprefix("unet.")
        for leaf in ("weight", "bias"):
            if leaf in sub:
                flat[f"{k}.{leaf}"] = sub[leaf]
    return flat


def _torch_key_to_flax_path(key: str) -> List[str]:
    """diffusers torch naming -> flax tree path (leaf name still torch's).
    ``down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.weight`` ->
    ``[down_blocks_0, attentions_1, transformer_blocks_0, attn2, to_k, weight]``.
    """
    parts: List[str] = []
    for tok in key.split("."):
        if tok.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{tok}"
        else:
            parts.append(tok)
    return parts


def _place(params: Dict, path: List[str], leaf: str, value: np.ndarray) -> Tuple[bool, str]:
    """Write one torch tensor into the flax tree; returns (ok, reason)."""
    node = params
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return False, f"missing subtree {'/'.join(path)}"
        node = node[p]
    if not isinstance(node, dict):
        return False, f"{'/'.join(path)} is a leaf, expected a module"
    if leaf == "bias":
        name = "bias"
    elif "kernel" in node:
        name = "kernel"
        value = value.T if value.ndim == 2 else (
            value.transpose(2, 3, 1, 0) if value.ndim == 4 else value
        )
    elif "scale" in node:
        name = "scale"
    elif "embedding" in node:
        name = "embedding"
    else:
        return False, f"no weight-like leaf under {'/'.join(path)} (has {list(node)})"
    if name not in node:
        return False, f"{'/'.join(path)} has no {name}"
    if np.shape(node[name]) != value.shape:
        return False, (
            f"shape mismatch at {'/'.join(path)}/{name}: "
            f"params {np.shape(node[name])} vs overlay {value.shape}"
        )
    node[name] = value.astype(np.asarray(node[name]).dtype, copy=False)
    return True, ""


def apply_erasure_overlay(params: Dict, spec, path: str, strict: bool = True) -> Dict:
    """Returns a copy of ``params`` with the overlay laid over it."""
    import copy

    params = copy.deepcopy(params)
    if path.endswith(".npz"):
        data = np.load(path)
        for key in data.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = data[key]
        return params

    from ..models.convert import load_torch_state_dict

    sd = load_torch_state_dict(path)
    # ESD nested layout: values are dicts of weight/bias
    if sd and all(isinstance(v, dict) for v in sd.values()):
        sd = _flatten_esd(sd)
    skipped = []
    applied = 0
    for key, value in sd.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        *path_toks, leaf = _torch_key_to_flax_path(key)
        if leaf not in ("weight", "bias"):
            skipped.append((key, f"unhandled leaf {leaf}"))
            continue
        ok, reason = _place(params, path_toks, leaf, value)
        if ok:
            applied += 1
        else:
            skipped.append((key, reason))
    if skipped:
        msg = "; ".join(f"{k}: {r}" for k, r in skipped[:5])
        if strict:
            raise ValueError(
                f"overlay {path}: {len(skipped)} keys failed to apply "
                f"({applied} ok). First failures: {msg}"
            )
        logger.warning("overlay %s: skipped %d keys (%s)", path, len(skipped), msg)
    if applied == 0:
        raise ValueError(f"overlay {path}: no keys applied")
    return params


def save_overlay(params_subset: Dict, path: str):
    """Flatten a (partial) params tree to an .npz overlay."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + [k])
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(params_subset, [])
    np.savez(path, **flat)
