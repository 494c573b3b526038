"""UCE — Unified Concept Editing (training-free closed-form edit).

Reference: baselines/unified-concept-editing/train-scripts/train_erase.py:186-420.
Edits every cross-attention K/V projection so the edited concepts' keys map
to their replacement targets while a preservation set is (softly) kept:

    W' = (lambda*W + sum_i v_i k_i^T) @ (lambda*I + sum_i k_i k_i^T)^{-1}

with k = old-concept text embedding, v = W @ k_target (erase) or W @ k (keep).
Here the edit is a pure numpy transform over the flax params tree.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..models.unet_spec import UNetSpec


def _cross_attn_paths(params: Dict, spec: UNetSpec):
    """Yield (block_name, attn_name) for every transformer with cross-attn."""
    names = (
        [(f"down_blocks_{i}", b) for i, b in enumerate(spec.down)]
        + [("mid_block", spec.mid)]
        + [(f"up_blocks_{i}", b) for i, b in enumerate(spec.up)]
    )
    for bname, block in names:
        for j, t in enumerate(block.transformers):
            if t.dropped:
                continue
            yield bname, f"attentions_{j}"


def uce_edit(
    params: Dict,
    spec: UNetSpec,
    old_embeddings: np.ndarray,  # [n_edit, d_text] embeddings of concepts to erase
    new_embeddings: np.ndarray,  # [n_edit, d_text] replacement targets ("" for erase)
    preserve_embeddings: Optional[np.ndarray] = None,  # [n_keep, d_text]
    lamb: float = 0.5,
    erase_scale: float = 1.0,
    preserve_scale: float = 0.1,
) -> Dict:
    """Returns a new params tree with edited attn2 to_k/to_v kernels."""
    import copy

    params = copy.deepcopy(params)
    old = np.asarray(old_embeddings, np.float64)
    new = np.asarray(new_embeddings, np.float64)
    keep = (
        np.asarray(preserve_embeddings, np.float64)
        if preserve_embeddings is not None
        else np.zeros((0, old.shape[1]))
    )

    for bname, aname in _cross_attn_paths(params, spec):
        tb = params[bname][aname]["transformer_blocks_0"]["attn2"]
        for proj in ("to_k", "to_v"):
            # flax kernel is [d_text, inner]; torch math uses W [inner, d_text]
            W = np.asarray(tb[proj]["kernel"], np.float64).T
            d = W.shape[1]
            mat1 = lamb * W  # accumulates sum v k^T
            mat2 = lamb * np.eye(d)  # accumulates sum k k^T
            for k_old, k_new in zip(old, new):
                v = W @ k_new  # target value: what the new concept produces
                mat1 = mat1 + erase_scale * np.outer(v, k_old)
                mat2 = mat2 + erase_scale * np.outer(k_old, k_old)
            for k in keep:
                v = W @ k
                mat1 = mat1 + preserve_scale * np.outer(v, k)
                mat2 = mat2 + preserve_scale * np.outer(k, k)
            W_new = mat1 @ np.linalg.inv(mat2)
            tb[proj]["kernel"] = W_new.T.astype(np.float32)
    return params
