"""Prompt hypernetwork: sentence embedding -> per-gate architecture logits.

Flax port of the reference HyperStructure (pdm/models/hypernet.py:25-98):
one weight-normed Linear per width sub-vector plus one Linear for all depth
bits, orthogonal-initialized; optional ``single_arch_param`` mode where the
arch vector is a free parameter (SingleArchUnetFinetuner path,
trainer.py:3403-3474).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..utils.arch import GateLayout


def _orthogonal_rows(key, shape, dtype=jnp.float32):
    # torch orthogonal_ on [out, in]; flax kernels are [in, out]
    import jax

    q = jax.nn.initializers.orthogonal()(key, (shape[1], shape[0]), dtype)
    return q.T


class WeightNormDense(nn.Module):
    """Dense with torch-style weight_norm over output rows:
    W[o, :] = g[o] * v[o, :] / ||v[o, :]||."""

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        v = self.param("v", _orthogonal_rows, (x.shape[-1], self.features))  # [in, out]
        g = self.param("g", lambda k, s: jnp.linalg.norm(v, axis=0), (self.features,))
        kernel = v / jnp.linalg.norm(v, axis=0, keepdims=True) * g[None, :]
        y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class HyperStructure(nn.Module):
    layout: GateLayout
    input_dim: int = 768
    wn_flag: bool = True
    linear_bias: bool = False
    single_arch_param: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: [B, input_dim] sentence embeddings -> [B, total_dim] logits.
        In single_arch_param mode the input is ignored and the learned [1, D]
        arch parameter is returned."""
        if self.single_arch_param:
            arch = self.param(
                "arch", nn.initializers.normal(1.0), (1, self.layout.total_dim)
            )
            return arch

        assert x is not None
        dense_cls = WeightNormDense if self.wn_flag else nn.Dense
        outs = []
        for i, w in enumerate(self.layout.width_list):
            layer = (
                dense_cls(w, use_bias=self.linear_bias, dtype=self.dtype, name=f"mh_fc_{i}")
                if self.wn_flag
                else nn.Dense(w, use_bias=self.linear_bias, dtype=self.dtype, name=f"mh_fc_{i}")
            )
            outs.append(layer(x))
        n = len(self.layout.width_list)
        if self.layout.num_depth > 0:  # layouts without depth gates (Flux) skip the head
            depth_layer = (
                dense_cls(
                    self.layout.num_depth, use_bias=self.linear_bias, dtype=self.dtype,
                    name=f"mh_fc_{n}",
                )
                if self.wn_flag
                else nn.Dense(
                    self.layout.num_depth, use_bias=self.linear_bias, dtype=self.dtype,
                    name=f"mh_fc_{n}",
                )
            )
            outs.append(depth_layer(x))
        return jnp.concatenate(outs, axis=1)


def convert_hypernet(sd, layout: GateLayout) -> dict:
    """HF torch HyperStructure checkpoint -> flax params. Handles both the
    weight-norm parametrized form (…parametrizations.weight.original0/1)
    and plain Linear weights."""
    import numpy as np

    params = {}
    n_layers = len(layout.width_list) + 1
    for i in range(n_layers):
        p = f"mh_fc.{i}"
        if not any(
            f"{p}.{suffix}" in sd
            for suffix in ("parametrizations.weight.original0", "weight_g", "weight")
        ):
            continue  # e.g. zero-width depth head in layouts with no depth gates
        if f"{p}.parametrizations.weight.original0" in sd:
            g = np.asarray(sd[f"{p}.parametrizations.weight.original0"]).reshape(-1)
            v = np.asarray(sd[f"{p}.parametrizations.weight.original1"])  # [out, in]
            entry = {"g": g, "v": v.T}
        elif f"{p}.weight_g" in sd:  # legacy torch weight_norm
            g = np.asarray(sd[f"{p}.weight_g"]).reshape(-1)
            v = np.asarray(sd[f"{p}.weight_v"])
            entry = {"g": g, "v": v.T}
        else:
            entry = {"kernel": np.asarray(sd[f"{p}.weight"]).T}
        if f"{p}.bias" in sd:
            entry["bias"] = np.asarray(sd[f"{p}.bias"])
        params[f"mh_fc_{i}"] = entry
    if "arch" in sd:
        params = {"arch": np.asarray(sd["arch"])}
    return params
