"""Architecture-codebook vector quantizer with Sinkhorn optimal-transport
assignment.

Functional JAX redesign of the reference StructureVectorQuantizer
(pdm/models/quantizer.py:14-342). Params/state are explicit:

- params  = {"embedding": [n_e, dim]}            (trainable codebook)
- state   = {"embedding_gs": [n_e, dim]}         (gumbel-sigmoid snapshot,
              updated every training forward; used verbatim at eval)

The distributed Sinkhorn needs no special casing: under jit with a sharded
batch the row/column sums are global reductions XLA lowers to psums over the
mesh — the explicit torch.distributed.all_reduce calls (quantizer.py:287-298)
disappear.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.arch import GateLayout
from ..utils.estimation import (
    gumbel_sigmoid_sample,
    hard_concrete,
    importance_gumbel_softmax_sample,
)


@dataclass(frozen=True)
class QuantizerConfig:
    layout: GateLayout
    n_e: int = 8
    beta: float = 0.25
    temperature: float = 0.4
    base: float = 2.0
    depth_order: Optional[Tuple[int, ...]] = None
    non_zero_width: bool = True
    sinkhorn_epsilon: float = 0.05
    sinkhorn_iterations: int = 3
    resource_aware_normalization: bool = True
    optimal_transport: bool = True
    order_depth: bool = True

    # ---- layout-derived static views -------------------------------------
    @property
    def vq_embed_dim(self) -> int:
        return self.layout.total_dim

    @property
    def width_list(self):
        return self.layout.width_list

    @property
    def num_width(self) -> int:
        return self.layout.num_width

    @property
    def depth_list(self):
        return self.layout.depth_list

    @property
    def width_intervals(self):
        sums = [sum(s.widths) for s in self.layout.submodules]
        idx = np.concatenate([[0], np.cumsum(sums)])
        return [(int(idx[i]), int(idx[i + 1])) for i in range(len(sums))]

    @property
    def depth_indices(self):
        # reference quantizer.py:64-65 (only meaningful where depth_list==1)
        widths_sum = self.num_width - 1
        return (widths_sum + np.cumsum(self.depth_list)).tolist()

    @property
    def resolved_depth_order(self):
        nd = self.layout.num_depth
        order = self.depth_order if self.depth_order is not None else tuple(range(nd))
        return tuple(i % nd for i in order)

    def template(self) -> jnp.ndarray:
        t = np.array(self.width_list + [1] * self.layout.num_depth, dtype=np.float32)
        t = np.repeat(t, t.astype(np.int64))
        return jnp.asarray(1.0 / t)

    def init_params(self, key) -> dict:
        emb = jax.nn.initializers.orthogonal()(key, (self.n_e, self.vq_embed_dim))
        return {"embedding": emb}

    def init_state(self, params) -> dict:
        return {"embedding_gs": jnp.array(params["embedding"]), "prunable_macs_template": None}

    def set_prunable_macs_template(self, state: dict, prunable_macs_list) -> dict:
        """prunable_macs_list: per-submodule list of per-gate prunable MACs
        (reference quantizer.py:254-263)."""
        depth_template = []
        for i, d in enumerate(self.depth_list):
            if d == 1:
                depth_template.append([sum(prunable_macs_list[i])])
        flat = [x for sub in (list(prunable_macs_list) + depth_template) for x in sub]
        reps = np.array(self.width_list + [1] * len(depth_template), dtype=np.int64)
        tpl = np.repeat(np.asarray(flat, np.float32), reps)
        return dict(state, prunable_macs_template=jnp.asarray(tpl))

    # ---- relaxations ------------------------------------------------------
    def gumbel_sigmoid_trick(self, key: jax.Array, z: jnp.ndarray) -> jnp.ndarray:
        """Relax codebook rows into (0,1) gates (quantizer.py:197-217).
        Pass a fixed key for the reference's deterministic-eval mode."""
        nw = self.num_width
        z_w, z_d = z[:, :nw], z[:, nw:]
        kd, kw = jax.random.split(key)
        d = importance_gumbel_softmax_sample(kd, z_d, self.temperature, self.base)
        if self.order_depth:
            out_d = jnp.zeros_like(d)
            out_d = out_d.at[:, list(self.resolved_depth_order)].set(d)
        else:
            out_d = jnp.zeros_like(d)
        keys = jax.random.split(kw, len(self.width_list))
        outs = []
        start = 0
        for i, w in enumerate(self.width_list):
            outs.append(
                gumbel_sigmoid_sample(
                    keys[i],
                    z_w[:, start : start + w],
                    self.temperature,
                    self.base,
                    force_width_non_zero=self.non_zero_width,
                )
            )
            start += w
        return jnp.concatenate(outs + [out_d], axis=1)

    def width_depth_normalize(self, state: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Couple width slices with their depth bit, rescale by 1/sqrt(size)
        and (optionally) per-gate prunable-MACs (quantizer.py:235-252)."""
        out = hard_concrete(x)
        for i, d in enumerate(self.depth_list):
            if d != 0:
                a, b = self.width_intervals[i]
                di = self.depth_indices[i]
                out = out.at[:, a:b].set(x[:, a:b] * x[:, di : di + 1])
        out = out * jax.lax.stop_gradient(jnp.sqrt(self.template()))
        if self.resource_aware_normalization and state.get("prunable_macs_template") is not None:
            out = out * jax.lax.stop_gradient(state["prunable_macs_template"])
        return out

    # ---- assignment --------------------------------------------------------
    def sinkhorn(self, out: jnp.ndarray) -> jnp.ndarray:
        """SwAV-style Sinkhorn (quantizer.py:304-325). Under a sharded batch
        the sums are global collectives automatically."""
        Q = jnp.exp(out / self.sinkhorn_epsilon).T  # [K, B]
        B, K = Q.shape[1], Q.shape[0]
        Q = Q / jnp.sum(Q)
        for _ in range(self.sinkhorn_iterations):
            Q = Q / jnp.sum(Q, axis=1, keepdims=True) / K
            Q = Q / jnp.sum(Q, axis=0, keepdims=True) / B
        return (Q * B).T

    def _indices(self, key, state, embedding_gs, z, training: bool) -> jnp.ndarray:
        v = self.width_depth_normalize(state, embedding_gs)
        codes = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        u = self.width_depth_normalize(state, self.gumbel_sigmoid_trick(key, z))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        sim = jax.lax.stop_gradient(u @ codes.T)
        if training and self.optimal_transport:
            sim = self.sinkhorn(sim)
        return jnp.argmax(sim, axis=-1)

    def assign(self, key, params, state, z: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """Arch vectors [B, dim] -> codebook indices [B] (expert routing /
        dataset filtering path, data_utils.py:322-350)."""
        if training:
            embedding_gs = self.gumbel_sigmoid_trick(jax.random.split(key)[0], params["embedding"])
        else:
            embedding_gs = state["embedding_gs"]
        return self._indices(key, state, embedding_gs, z, training)

    def __call__(
        self, key, params: dict, state: dict, z: jnp.ndarray, training: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
        """Forward (quantizer.py:137-170): returns (z_q, indices, new_state).
        Training: z_q differentiable into the codebook; eval: hard gates from
        the stored embedding_gs snapshot."""
        k1, k2 = jax.random.split(key)
        if training:
            embedding_gs = self.gumbel_sigmoid_trick(k1, params["embedding"])
            new_state = dict(state, embedding_gs=jax.lax.stop_gradient(embedding_gs))
        else:
            embedding_gs = state["embedding_gs"]
            new_state = state
        indices = self._indices(k2, state, embedding_gs, z, training)
        z_q = embedding_gs[indices]
        if not training:
            z_q = hard_concrete(z_q)
        return z_q, indices, new_state

    def get_codebook_entry_gumbel_sigmoid(
        self, key, params: dict, indices: jnp.ndarray, hard: bool = False
    ) -> jnp.ndarray:
        z_q = params["embedding"][indices]
        out = self.gumbel_sigmoid_trick(key, z_q)
        return hard_concrete(out) if hard else out
