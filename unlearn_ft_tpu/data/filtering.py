"""Expert dataset filtering: assign every caption to a codebook expert via
hypernet + quantizer cosine assignment in batches (reference filter_dataset,
pdm/utils/data_utils.py:322-350; batches of 2048).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def filter_dataset_by_expert(
    mpnet_embeddings: np.ndarray,
    hypernet,
    hypernet_params,
    quantizer_cfg,
    quantizer_params,
    quantizer_state,
    expert_id: int,
    batch_size: int = 2048,
) -> np.ndarray:
    """Returns the boolean mask of samples routed to ``expert_id``."""

    @jax.jit
    def assign(emb):
        logits = hypernet.apply({"params": hypernet_params}, emb)
        return quantizer_cfg.assign(
            jax.random.PRNGKey(0), quantizer_params, quantizer_state, logits, training=False
        )

    picks = []
    n = mpnet_embeddings.shape[0]
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(mpnet_embeddings[i : i + batch_size])
        pad = 0
        if chunk.shape[0] < batch_size and i > 0:
            pad = batch_size - chunk.shape[0]
            chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
        idx = np.asarray(assign(chunk))
        if pad:
            idx = idx[:-pad]
        picks.append(idx)
    indices = np.concatenate(picks)
    return indices == expert_id
