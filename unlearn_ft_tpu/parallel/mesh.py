"""Device mesh + sharding helpers.

The reference's entire distribution story is DDP over NCCL via accelerate
(SURVEY.md §2.4). TPU-native equivalent: one `jax.sharding.Mesh` with a
'dp' axis over ICI; batches are sharded on 'dp', params replicated, and
every collective (gradient psum, the contrastive all_gather, Sinkhorn
all_reduce) is inserted by XLA from the sharding annotations — there are no
explicit communication calls anywhere in the framework.

The mesh shape is (dp,) today; model axes ('tp') can be added to the same
Mesh without touching the train steps, since they are sharding-agnostic.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp", batch_axis: int = 0):
    """Shard every leaf's batch dimension (``batch_axis``) across the mesh.

    ``batch_axis=1`` serves gradient-accumulation batches, whose leaves are
    [accum, batch, ...] — the microbatch axis stays unsharded (it is scanned
    inside the step), the batch axis shards on dp.

    Multi-host contract: each process passes its OWN per-host shard of the
    global batch (the loaders already shard records by jax.process_index,
    DistributedSampler-style), and the leaves are assembled into one global
    array via jax.make_array_from_process_local_data — a plain device_put of
    host-local numpy onto a global NamedSharding would be wrong on a real
    multi-host mesh. Single-process keeps the direct device_put fast path.
    """
    spec = [None] * batch_axis + [axis_name]
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_moments(tree, mesh: Mesh, axis_name: str = "dp"):
    """ZeRO-1-style optimizer-state sharding: each leaf's largest
    dp-divisible dimension is split across the mesh, so each chip holds
    1/N of the AdamW moments (the bilevel mix carries TWO moment sets over
    ~500M params — replicated fp32 they exceed 16GB v5e HBM). Params stay
    replicated; XLA inserts the update-time collectives from the sharding
    annotations, exactly like the gradient psum. Falls back to replication
    for leaves with no divisible dimension (scalars, odd shapes)."""
    n = mesh.devices.size
    if n == 1:
        return replicate(tree, mesh)

    def spec_for(x):
        shape = np.shape(x)
        if not shape:
            return P()
        for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if shape[d] % n == 0 and shape[d] >= n:
                spec = [None] * len(shape)
                spec[d] = axis_name
                return P(*spec)
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))), tree
    )


def shard_params(tree, mesh: Mesh, axis_name: str = "dp"):
    """FSDP-style sharding for FROZEN towers: each leaf's largest
    dp-divisible dimension splits across the mesh (same heuristic as
    shard_moments), so each chip holds 1/N of the weights and XLA
    all-gathers each one at its use site. The towers are read-only, so
    there is no scatter-back — plain weight gathering is exact, not an
    approximation. This is what unlocks full-scale Flux-dev pruning
    (reference trainer.py:1596-2113 trains it on H100s): the 11.8B frozen
    tower is ~24GB bf16 — over one 16GB v5e chip it cannot exist, over a
    v5e-8 dp mesh it is ~3GB/chip. Config key: parallel.shard_frozen."""
    return shard_moments(tree, mesh, axis_name)
