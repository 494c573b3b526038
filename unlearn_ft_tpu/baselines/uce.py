"""UCE — Unified Concept Editing (training-free closed-form edit).

Reference: baselines/unified-concept-editing/train-scripts/train_erase.py:186-420
(erase/moderation) and train_debias.py:170-420 (debias).
Edits every cross-attention K/V projection — all transformer layers of every
non-dropped transformer, matching the reference's traversal over
``attn.transformer_blocks`` — so the edited concepts' keys map to their
replacement targets while a preservation set is (softly) kept:

    W' = (lambda*W + sum_i v_i k_i^T) @ (lambda*I + sum_i k_i k_i^T)^{-1}

with k = old-concept text embedding, v = W @ k_target (erase) or W @ k (keep).
Here the edit is a pure numpy transform over the flax params tree. Concepts
spanning several token positions are passed as several rows of
``old_embeddings``/``new_embeddings`` — the sums above run over rows.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..models.unet_spec import UNetSpec


def _cross_attn_paths(spec: UNetSpec):
    """Yield (block_name, attn_name, layer_name) for every transformer layer
    with cross-attention (reference edit_model collects ``transformer.attn2``
    for every transformer_block of every attention, train_erase.py:191-210)."""
    names = (
        [(f"down_blocks_{i}", b) for i, b in enumerate(spec.down)]
        + [("mid_block", spec.mid)]
        + [(f"up_blocks_{i}", b) for i, b in enumerate(spec.up)]
    )
    for bname, block in names:
        for j, t in enumerate(block.transformers):
            if t.dropped:
                continue
            for li in range(t.num_layers):
                yield bname, f"attentions_{j}", f"transformer_blocks_{li}"


def _edit_kernel(W: np.ndarray, mat1_terms, mat2_terms, lamb: float) -> np.ndarray:
    d = W.shape[1]
    mat1 = lamb * W
    mat2 = lamb * np.eye(d)
    for scale, v, k in mat1_terms:
        mat1 = mat1 + scale * np.outer(v, k)
    for scale, k in mat2_terms:
        mat2 = mat2 + scale * np.outer(k, k)
    return mat1 @ np.linalg.inv(mat2)


def uce_edit(
    params: Dict,
    spec: UNetSpec,
    old_embeddings: np.ndarray,  # [n_edit, d_text] embeddings of concepts to erase
    new_embeddings: np.ndarray,  # [n_edit, d_text] replacement targets ("" for erase)
    preserve_embeddings: Optional[np.ndarray] = None,  # [n_keep, d_text]
    lamb: float = 0.5,
    erase_scale: float = 1.0,
    preserve_scale: float = 0.1,
    technique: str = "replace",
) -> Dict:
    """Returns a new params tree with edited attn2 to_k/to_v kernels.

    ``technique`` follows the reference (train_erase.py:282-295):
    - "replace" (the reference CLI default): target value = W @ k_new.
    - "tensor": target = W @ k_new with its component along the *old*
      concept's value direction removed (orthogonalized), so the edit
      erases the old direction instead of substituting the new one.
    """
    import copy

    assert technique in ("replace", "tensor"), technique
    params = copy.deepcopy(params)
    old = np.asarray(old_embeddings, np.float64)
    new = np.asarray(new_embeddings, np.float64)
    keep = (
        np.asarray(preserve_embeddings, np.float64)
        if preserve_embeddings is not None
        else np.zeros((0, old.shape[1]))
    )

    def _target(W, k_old, k_new):
        v = W @ k_new
        if technique == "tensor":
            u = W @ k_old
            u = u / max(np.linalg.norm(u), 1e-12)
            v = v - (u @ v) * u
        return v

    for bname, aname, lname in _cross_attn_paths(spec):
        tb = params[bname][aname][lname]["attn2"]
        for proj in ("to_k", "to_v"):
            # flax kernel is [d_text, inner]; torch math uses W [inner, d_text]
            W = np.asarray(tb[proj]["kernel"], np.float64).T
            mat1_terms = [
                # target value: what the replacement concept produces under W
                (erase_scale, _target(W, k_old, k_new), k_old)
                for k_old, k_new in zip(old, new)
            ]
            mat1_terms += [(preserve_scale, W @ k, k) for k in keep]
            mat2_terms = [(erase_scale, k) for k in old]
            mat2_terms += [(preserve_scale, k) for k in keep]
            W_new = _edit_kernel(W, mat1_terms, mat2_terms, lamb)
            tb[proj]["kernel"] = W_new.T.astype(np.float32)
    return params


def uce_debias_edit(
    params: Dict,
    spec: UNetSpec,
    concept_embeddings: Sequence[np.ndarray],  # per concept: [n_tok, d_text]
    attribute_embeddings: Sequence[Sequence[np.ndarray]],  # per concept: list of [n_tok_a, d_text]
    weights: Sequence[np.ndarray],  # per concept: [n_attributes]
    preserve_embeddings: Optional[np.ndarray] = None,
    lamb: float = 0.1,
    erase_scale: float = 0.1,
    preserve_scale: float = 0.1,
) -> Dict:
    """One closed-form debias edit (train_debias.py:275-330): for every
    concept, the target value is the concept's own projection plus
    ``w_j * ||W k|| * normalize(W a_j)`` per attribute direction — positive
    weights push the concept toward the under-represented attribute. The
    outer loop that measures attribute ratios and updates the weights is
    host-side (see ``debias_weight_update``)."""
    import copy

    params = copy.deepcopy(params)
    keep = (
        np.asarray(preserve_embeddings, np.float64)
        if preserve_embeddings is not None
        else None
    )

    for bname, aname, lname in _cross_attn_paths(spec):
        tb = params[bname][aname][lname]["attn2"]
        for proj in ("to_k", "to_v"):
            W = np.asarray(tb[proj]["kernel"], np.float64).T
            mat1_terms = []
            mat2_terms = []
            for c_emb, attrs, w in zip(concept_embeddings, attribute_embeddings, weights):
                k = np.asarray(c_emb, np.float64)  # [n_tok, d]
                o = k @ W.T  # [n_tok, inner] — the concept's current values
                target = o.copy()
                for j, a_emb in enumerate(attrs):
                    u = np.asarray(a_emb, np.float64) @ W.T  # attribute values
                    # align token spans (the reference trims both to a common
                    # window around the final concept token)
                    n = min(o.shape[0], u.shape[0])
                    u = u[:n] / max(np.linalg.norm(u[:n]), 1e-12)
                    target[:n] = target[:n] + float(w[j]) * np.linalg.norm(o[:n]) * u
                for row_k, row_v in zip(k, target):
                    mat1_terms.append((erase_scale, row_v, row_k))
                    mat2_terms.append((erase_scale, row_k))
            if keep is not None:
                for kk in keep:
                    mat1_terms.append((preserve_scale, W @ kk, kk))
                    mat2_terms.append((preserve_scale, kk))
            W_new = _edit_kernel(W, mat1_terms, mat2_terms, lamb)
            tb[proj]["kernel"] = W_new.T.astype(np.float32)
    return params


def debias_weight_update(
    ratios: np.ndarray,  # [n_concepts, n_attributes] measured attribute ratios
    desired: Optional[np.ndarray] = None,  # default: uniform
    weight_step: float = 0.1,
    max_bias_diff: float = 0.05,
):
    """Host-side controller for the debias loop (train_debias.py:232-270):
    weights_delta = step * (desired - measured); concepts already within
    ``max_bias_diff`` get zero delta (and should move to the preserve set).
    Returns (weights, converged_mask)."""
    ratios = np.asarray(ratios, np.float64)
    if desired is None:
        desired = np.full_like(ratios, 1.0 / ratios.shape[1])
    delta = weight_step * (desired - ratios)
    converged = np.abs(ratios - desired).max(axis=1) < max_bias_diff
    delta[converged] = 0.0
    return delta, converged
