"""Ahead-of-time executable persistence.

A jitted train step over the 508M-param bilevel mix costs ~220s of Python
tracing + lowering per process on this host before the persistent
compilation cache can even be consulted (measured round 4; the cache then
removes only the ~400-650s XLA compile). Serializing the COMPILED
executable (``jax.experimental.serialize_executable``) removes tracing,
lowering, cache lookup and compilation from the start-up path entirely:
deserialize+load measures ~0.02s for a ~110MB step executable.

Used by ``bench.py``'s fast path and available to trainers for fast
restart-after-preemption. Artifacts are guarded by a source fingerprint, the
jax version, and the device kind: any mismatch makes ``load_executable``
return ``None`` so callers fall back to the ordinary jit path instead of
silently benchmarking a stale program.

The reference has no analogue — torch dispatches eagerly, so there is no
retrace cost to amortize; this is a JAX/XLA-specific start-up concern
around the hot loop of trainer.py:2308-2373.
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Optional

# NOTE: jax is imported lazily inside save/load so that source_fingerprint
# stays usable from JAX-free supervisor processes (bench.py's staged parent).

_FORMAT = 1


def source_fingerprint(*roots: str, extra: str = "", exclude: tuple = ()) -> str:
    """sha256 over every ``.py`` file under ``roots`` (path-stable: hashed by
    path relative to each root) plus ``extra`` (encode anything else that
    shapes the program: shapes, flags, dtypes). ``exclude`` drops root-relative
    paths (e.g. host-side-only modules living inside a traced package)."""
    h = hashlib.sha256()
    for root in roots:
        if os.path.isfile(root):
            entries = [(os.path.basename(root), root)]
        else:
            entries = sorted(
                (os.path.relpath(os.path.join(dp, f), root), os.path.join(dp, f))
                for dp, _, fs in os.walk(root)
                for f in fs
                if f.endswith(".py")
            )
        entries = [(rel, p) for rel, p in entries if rel not in exclude]
        for rel, p in entries:
            h.update(rel.encode())
            with open(p, "rb") as fh:
                h.update(fh.read())
    h.update(extra.encode())
    return h.hexdigest()


def _meta_path(path: str) -> str:
    return path + ".json"


def save_executable(path: str, compiled, fingerprint: str = "") -> dict:
    """Serialize a ``jax.stages.Compiled`` to ``path`` (+ a ``.json`` sidecar
    carrying the staleness guards). Atomic via os.replace."""
    import jax
    from jax.experimental import serialize_executable as se

    serialized, in_tree, out_tree = se.serialize(compiled)
    # the executable is bound to a device count; deserialize_and_load
    # defaults to ALL local devices, which breaks on a host exposing more
    # (e.g. the 8-virtual-CPU test mesh) — record the count and restore it
    device_assignment = getattr(compiled._executable, "_device_assignment", None)
    num_devices = len(device_assignment) if device_assignment is not None else 1
    blob = pickle.dumps((serialized, in_tree, out_tree), protocol=pickle.HIGHEST_PROTOCOL)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)
    meta = {
        "format": _FORMAT,
        "fingerprint": fingerprint,
        "jax": jax.version.__version__,
        "device_kind": jax.devices()[0].device_kind,
        "num_devices": num_devices,
        "bytes": len(blob),
    }
    with open(_meta_path(path) + ".tmp", "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(_meta_path(path) + ".tmp", _meta_path(path))
    return meta


def load_executable(path: str, fingerprint: str = "", verbose: bool = False):
    """Deserialize an executable saved by :func:`save_executable`.

    Returns the callable ``jax.stages.Compiled`` (same call signature and
    donation semantics as the jit function it was compiled from), or
    ``None`` when the artifact is missing, was built from different sources
    (fingerprint mismatch), or targets a different jax version / device
    kind — callers then fall back to the jit path.
    """
    import jax

    def _skip(why: str):
        if verbose:
            import sys

            print(f"# aot: skipping {os.path.basename(path)}: {why}", file=sys.stderr)
        return None

    if not (os.path.exists(path) and os.path.exists(_meta_path(path))):
        return _skip("missing")
    try:
        with open(_meta_path(path)) as fh:
            meta = json.load(fh)
    except (OSError, ValueError) as e:
        return _skip(f"unreadable sidecar ({e})")
    if meta.get("format") != _FORMAT:
        return _skip(f"format {meta.get('format')} != {_FORMAT}")
    if fingerprint and meta.get("fingerprint") != fingerprint:
        return _skip("stale (source fingerprint changed — regenerate with --save-exec)")
    if meta.get("jax") != jax.version.__version__:
        return _skip(f"jax {meta.get('jax')} != {jax.version.__version__}")
    kind = jax.devices()[0].device_kind
    if meta.get("device_kind") != kind:
        return _skip(f"device {meta.get('device_kind')} != {kind}")
    num = int(meta.get("num_devices", 1))
    if len(jax.devices()) < num:
        return _skip(f"needs {num} devices, host has {len(jax.devices())}")
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as fh:
            serialized, in_tree, out_tree = pickle.load(fh)
        return se.deserialize_and_load(
            serialized, in_tree, out_tree, execution_devices=jax.devices()[:num]
        )
    except Exception as e:  # corrupted / runtime-incompatible artifact
        return _skip(f"{type(e).__name__}: {str(e)[:120]}")


def compile_and_save(
    jitted, path: str, *args, fingerprint: str = "", **kwargs
) -> Optional[object]:
    """AOT ``lower().compile()`` of ``jitted`` at ``args`` and persist it.

    The compile consults the persistent compilation cache (verified on jax
    0.9: an AOT compile after a jit compile of the same program is a cache
    hit), so regeneration after a code change costs one trace+lower plus
    whatever the cache cannot supply. Returns the Compiled (usable
    immediately — saves a second trace for the caller).
    """
    compiled = jitted.lower(*args, **kwargs).compile()
    save_executable(path, compiled, fingerprint=fingerprint)
    return compiled
