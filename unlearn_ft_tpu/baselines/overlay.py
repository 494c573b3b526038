"""Apply an erasure checkpoint overlay onto expert U-Net params (the
reference's --erasure_ckpt_path path, scripts/metrics/generate_fid_images.py:97-111):
ESD/UCE outputs are (partial) state dicts laid over the fine-tuned weights."""
from __future__ import annotations

from typing import Dict

import numpy as np


def apply_erasure_overlay(params: Dict, spec, path: str) -> Dict:
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
    raise ValueError(
        "expected a .npz overlay of flax param paths (export ESD/UCE results "
        "with save_overlay)"
    )


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
