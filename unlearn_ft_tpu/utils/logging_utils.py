"""Run logging: wandb when available, JSONL fallback otherwise.

Covers the reference's tracker usage (report_to: wandb, scalar logs per step,
run-dir naming — pdm/utils/logging_utils.py, trainer.py:394-403,1003-1020).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("unlearn_ft_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def init_logging_dir(config) -> str:
    base = config.get_path("training.logging.logging_dir", "./logs")
    name = config.get("wandb_run_name") or time.strftime("run-%Y%m%d-%H%M%S")
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.yaml"), "w") as f:
        f.write(config.to_yaml())
    return path


def create_heatmap(matrix, path: str, title: str = ""):
    """Save a similarity/ratio heatmap (reference logging_utils.create_heatmap,
    seaborn-based). Uses matplotlib when present; always saves the raw .npy."""
    import numpy as np

    np.save(path + ".npy", np.asarray(matrix))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(np.asarray(matrix), cmap="viridis")
        fig.colorbar(im)
        ax.set_title(title)
        fig.savefig(path + ".png", bbox_inches="tight")
        plt.close(fig)
    except Exception:
        pass


class Tracker:
    """wandb if importable and configured, else JSONL scalars file."""

    def __init__(self, config, logging_dir: str, primary_host: bool = None):
        self.logging_dir = logging_dir
        self._wandb = None
        self._f = None
        # multi-host: metrics are identical on every host (replicated step
        # outputs) — only process 0 opens wandb / the JSONL file, like the
        # reference's accelerate main-process trackers (trainer.py:394-403)
        if primary_host is None:
            import jax

            primary_host = jax.process_index() == 0
        self.primary_host = bool(primary_host)
        if not self.primary_host:
            return
        report_to = config.get_path("training.logging.report_to", "jsonl")
        if report_to == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(
                    project=config.get_path(
                        "training.logging.tracker_project_name", "unlearn-ft-tpu"
                    ),
                    name=config.get("wandb_run_name"),
                    dir=config.get_path("training.logging.wandb_log_dir", logging_dir),
                    config=config.to_dict(),
                )
            except Exception as e:  # pragma: no cover - wandb absent in image
                logger.warning("wandb unavailable (%s); falling back to JSONL", e)
        self._f = open(os.path.join(logging_dir, "metrics.jsonl"), "a")

    def log(self, metrics: Dict, step: Optional[int] = None):
        if not self.primary_host:
            return
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        self._f.write(json.dumps({"step": step, **scalars}) + "\n")
        self._f.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._f is not None:
            self._f.close()
