"""Flat-buffer packing of pytrees for dispatch-efficient train steps.

The bilevel train step's boundary is huge: ~700 student param leaves, ~900
optimizer-state leaves, ~900 frozen teacher/VAE leaves — every one a separate
device buffer the runtime must reference on EVERY dispatch. Measured on the
v5e tunnel, per-call overhead grows ~9us per buffer (10 leaves: 1.8ms/call,
2000 leaves: 18.8ms/call), which put a ~76ms host-side gap between 324ms of
device work and the 400ms step wall time at batch 8 x accum 2.

The fix is TPU-native rather than a port concern (the reference's torch DDP
loop has no per-dispatch boundary at all): pack each pytree into ONE flat
buffer per dtype, dispatch on those few buffers, and unpack/repack INSIDE the
jitted step. The unpack is contiguous `lax.slice` + reshape (one extra HBM
read of the params), the repack one fused concatenate (one extra write) —
~10ms of memory traffic buys back ~70ms of dispatch bookkeeping. Packing
also collapses the host->device transfer of a 900-leaf tree into a handful
of bulk copies.

No equivalent exists in the reference (this is a JAX/XLA boundary concern);
the packed step is numerically identical to the tree step (tested in
tests/test_packing.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PackSpec", "make_pack_spec", "pack", "pack_host", "unpack",
           "make_packed_step"]


@dataclasses.dataclass(frozen=True)
class PackSpec:
    """Host-side recipe mapping a pytree to {dtype-name: flat buffer}.

    ``layout[i] = (bucket, offset, shape, dtype)`` for the i-th flattened
    leaf; ``sizes[bucket]`` is each flat buffer's total element count.
    Leaves larger than ``max_leaf_bytes`` (when set) are NOT packed — they
    ride through as individual buffers under the reserved ``_rest`` key
    (layout offset = their index in that tuple). Partial packing bounds the
    extra HBM of the unpack/repack copies: the dispatch cost is per BUFFER,
    not per byte, and ~75% of the leaves hold <2% of the bytes.
    """

    treedef: Any
    layout: Tuple[Tuple[str, int, Tuple[int, ...], Any], ...]
    sizes: Dict[str, int]
    n_rest: int = 0

    @property
    def buckets(self) -> List[str]:
        return sorted(self.sizes)


def _bucket_name(dtype) -> str:
    return np.dtype(dtype).name if not hasattr(dtype, "name") else dtype.name


def make_pack_spec(tree, max_leaf_bytes: int = 0) -> PackSpec:
    """Accepts arrays OR jax.ShapeDtypeStruct leaves (so specs can be built
    from ``jax.eval_shape`` without materializing e.g. an optimizer state).
    ``max_leaf_bytes > 0`` leaves larger arrays as passthrough buffers."""
    leaves, treedef = jax.tree.flatten(tree)
    offsets: Dict[str, int] = {}
    layout = []
    n_rest = 0
    for leaf in leaves:
        dt = leaf.dtype if hasattr(leaf, "dtype") else jnp.asarray(leaf).dtype
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        if max_leaf_bytes and size * np.dtype(dt).itemsize > max_leaf_bytes:
            layout.append(("_rest", n_rest, tuple(leaf.shape), dt))
            n_rest += 1
            continue
        bucket = _bucket_name(dt)
        off = offsets.get(bucket, 0)
        layout.append((bucket, off, tuple(leaf.shape), dt))
        offsets[bucket] = off + size
    return PackSpec(treedef=treedef, layout=tuple(layout), sizes=dict(offsets),
                    n_rest=n_rest)


def pack(tree, spec: PackSpec) -> Dict[str, Any]:
    """Tree -> {bucket: flat array} (+ ``_rest`` tuple of passthrough
    leaves). Works under jit (fused concatenate)."""
    leaves = jax.tree.leaves(tree)
    parts: Dict[str, list] = {b: [] for b in spec.sizes}
    rest: List[Any] = [None] * spec.n_rest
    for leaf, (bucket, off, _, _) in zip(leaves, spec.layout):
        if bucket == "_rest":
            rest[off] = leaf
        else:
            parts[bucket].append(jnp.ravel(leaf))
    out: Dict[str, Any] = {b: jnp.concatenate(ps) if len(ps) > 1 else ps[0]
                           for b, ps in parts.items()}
    if spec.n_rest:
        out["_rest"] = tuple(rest)
    return out


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bf16 & friends register as attributes, not names

        return np.dtype(getattr(ml_dtypes, name))


def pack_host(tree, spec: PackSpec) -> Dict[str, Any]:
    """Host-side pack (numpy): build the few flat buffers BEFORE device_put
    so the transfer itself is a handful of bulk copies."""
    leaves = jax.tree.leaves(tree)
    out: Dict[str, Any] = {b: np.empty((n,), dtype=_np_dtype(b))
                           for b, n in spec.sizes.items()}
    rest: List[Any] = [None] * spec.n_rest
    for leaf, (bucket, off, shape, dt) in zip(leaves, spec.layout):
        if bucket == "_rest":
            rest[off] = np.asarray(leaf).astype(_np_dtype(_bucket_name(dt)))
            continue
        size = int(np.prod(shape)) if shape else 1
        out[bucket][off:off + size] = np.asarray(leaf).ravel()
    if spec.n_rest:
        out["_rest"] = tuple(rest)
    return out


def unpack(buffers: Dict[str, Any], spec: PackSpec):
    """{bucket: flat array} -> tree. Contiguous slices + reshape under jit;
    passthrough leaves are returned as-is (zero copies)."""
    leaves = []
    for bucket, off, shape, dt in spec.layout:
        if bucket == "_rest":
            leaves.append(buffers["_rest"][off])
            continue
        size = int(np.prod(shape)) if shape else 1
        leaf = jax.lax.slice(buffers[bucket], (off,), (off + size,))
        leaves.append(leaf.reshape(shape))
    return jax.tree.unflatten(spec.treedef, leaves)


def make_packed_step(
    core_step: Callable,
    param_spec: PackSpec,
    opt_spec: PackSpec,
    frozen_spec: PackSpec,
):
    """Wrap an unjitted ``step(params, opt_state, frozen, batch, rng) ->
    (params, opt_state, metrics)`` core into a jitted step over flat buffers:

        packed(flat_params, flat_opt, flat_frozen, batch, rng)
            -> (flat_params, flat_opt, metrics)

    Flat param/opt buffers are donated, so XLA updates them in place; the
    frozen towers stay packed device constants across the run.
    """

    def packed(flat_params, flat_opt, flat_frozen, batch, rng):
        params = unpack(flat_params, param_spec)
        opt_state = unpack(flat_opt, opt_spec)
        frozen = unpack(flat_frozen, frozen_spec)
        new_params, new_opt, metrics = core_step(params, opt_state, frozen, batch, rng)
        return pack(new_params, param_spec), pack(new_opt, opt_spec), metrics

    return partial(jax.jit, donate_argnums=(0, 1))(packed)
