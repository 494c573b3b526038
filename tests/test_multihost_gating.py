"""Multi-host write gating: only process 0 writes checkpoints/metrics.

Simulates two "hosts" sharing one checkpoint/logging dir by constructing
the writers with explicit primary_host flags (single-process test env, so
jax.process_index() is always 0 — the flag injection stands in for the
second host). Reference analogue: accelerate main-process save hooks and
trackers (trainer.py:311-373, 394-403).
"""
import pytest

import os

import numpy as np

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

from unlearn_ft_tpu.training.checkpoint import CheckpointManager
from unlearn_ft_tpu.utils.config import Config
from unlearn_ft_tpu.utils.logging_utils import Tracker


def test_checkpoint_save_gated_on_primary_host(tmp_path):
    d = str(tmp_path / "ckpts")
    tree = {"w": np.ones((2, 2), np.float32), "step": 3}

    primary = CheckpointManager(d, primary_host=True)
    secondary = CheckpointManager(d, primary_host=False)

    # both hosts call save (as the trainers do unconditionally); only the
    # primary writes
    secondary.save(3, tree, extra_files={"quantizer_embeddings.npy": b"x"})
    assert secondary.all_steps() == []
    primary.save(3, tree, extra_files={"side.bin": b"x"})
    assert primary.all_steps() == [3]
    assert os.path.exists(os.path.join(primary.path(3), "side.bin"))

    # both hosts can read what the primary wrote
    assert secondary.latest_step() == 3
    restored = secondary.restore(3, {"w": np.zeros((2, 2), np.float32), "step": 0})
    np.testing.assert_array_equal(restored["w"], tree["w"])


def test_checkpoint_rotation_only_on_primary(tmp_path):
    d = str(tmp_path / "ckpts")
    tree = {"w": np.zeros((1,), np.float32)}
    primary = CheckpointManager(d, total_limit=2, primary_host=True)
    secondary = CheckpointManager(d, total_limit=2, primary_host=False)
    for s in (1, 2, 3):
        primary.save(s, tree)
        secondary.save(s, tree)  # must not double-write or double-rotate
    assert primary.all_steps() == [2, 3]


def test_tracker_gated_on_primary_host(tmp_path):
    cfg = Config({"training": {"logging": {"report_to": "jsonl"}}})
    primary = Tracker(cfg, str(tmp_path), primary_host=True)
    secondary = Tracker(cfg, str(tmp_path), primary_host=False)
    primary.log({"loss": 1.0}, step=1)
    secondary.log({"loss": 1.0}, step=1)  # no-op: would double-append
    primary.finish()
    secondary.finish()
    with open(tmp_path / "metrics.jsonl") as f:
        lines = [ln for ln in f if ln.strip()]
    assert len(lines) == 1
