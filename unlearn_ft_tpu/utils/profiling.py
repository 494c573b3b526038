"""Profiling utilities.

Replaces the reference's op_counter params/MACs report (op_counter.py:23-38,
logged at trainer startup, trainer.py:2180-2183) and adds what it never had:
real TPU timeline traces via jax.profiler.
"""
from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import jax
import numpy as np


def count_params(params: Dict) -> int:
    return int(sum(np.asarray(x).size for x in jax.tree.leaves(params)))


def params_report(name_to_tree: Dict[str, Dict]) -> str:
    lines = []
    for name, tree in name_to_tree.items():
        lines.append(f"{name}: {count_params(tree) / 1e6:.2f}M params")
    return " | ".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
