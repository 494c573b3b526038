"""Checkpointing: orbax trees + the reference's sidecar contract.

The reference saves ``checkpoint-{global_step}/`` dirs via accelerate hooks
with HF-format subfolders and copies ``arch_vector.pt`` into each one
(trainer.py:311-373, 452-514, 2366-2368); generation scripts consume the
arch vector + safetensors (scripts/metrics/generate_fid_images.py:81-111).

Here each checkpoint dir holds an orbax pytree (params/opt states/step) plus
``arch_vector.npy`` and ``unet_spec.json`` — the (spec, params) pair IS the
expert, so downstream tools never need the hypernet to rebuild the model.
"""
from __future__ import annotations

import json
import os
import re
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


class CheckpointManager:
    """``async_save=True`` moves the serialize/write/rotate half of ``save``
    onto a background thread so the train loop only pays the (unavoidable —
    the steps donate their buffers) device->host fetch; the reference's
    accelerate save hooks are fully blocking. Saves stay ordered (one writer
    thread); ``wait()`` joins the pending write and re-raises its error, and
    is called automatically before the next save/restore and must be called
    once after the loop (trainers do, via ``tracker.finish`` time)."""

    def __init__(self, directory: str, total_limit: Optional[int] = None,
                 async_save: bool = False, primary_host: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        self.total_limit = total_limit
        self.async_save = bool(async_save)
        # multi-host: only process 0 writes/rotates — the trees are
        # host-replicated numpy snapshots, so N processes sharing a
        # checkpoint dir would race the same orbax write + rotation
        # (reference gates via accelerate main-process hooks,
        # trainer.py:311-373). Reads (restore/latest_step) stay unrestricted.
        self.primary_host = (
            jax.process_index() == 0 if primary_host is None else bool(primary_host)
        )
        if self.primary_host:
            os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending: Optional[threading.Thread] = None
        self._pending_err: Optional[BaseException] = None

    def wait(self):
        """Join the in-flight async save, if any; re-raise its failure."""
        t, self._pending = self._pending, None
        if t is not None:
            t.join()
        err, self._pending_err = self._pending_err, None
        if err is not None:
            raise err

    # ---- discovery --------------------------------------------------------
    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = _CKPT_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        # join any in-flight async write so discovery sees it (all_steps
        # itself must NOT wait — _rotate calls it from the writer thread)
        self.wait()
        steps = self.all_steps()
        return steps[-1] if steps else None

    def path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    # ---- save/load ---------------------------------------------------------
    def save(
        self,
        step: int,
        tree: Dict[str, Any],
        arch_vector: Optional[np.ndarray] = None,
        spec_json: Optional[str] = None,
        extra_files: Optional[Dict[str, bytes]] = None,
    ):
        self.wait()  # serialize saves; surface the previous write's failure
        if not self.primary_host:
            return  # non-primary hosts skip the write entirely
        # snapshot to host numpy NOW — the caller's device buffers are
        # donated to the next step, and async writing must not race them
        tree = jax.tree.map(np.asarray, jax.device_get(tree))

        def _write():
            path = self.path(step)
            self._ckptr.save(os.path.join(path, "state"), tree, force=True)
            self._ckptr.wait_until_finished()
            if arch_vector is not None:
                np.save(os.path.join(path, "arch_vector.npy"), np.asarray(arch_vector))
            if spec_json is not None:
                with open(os.path.join(path, "unet_spec.json"), "w") as f:
                    f.write(spec_json)
            for name, data in (extra_files or {}).items():
                with open(os.path.join(path, name), "wb") as f:
                    f.write(data)
            self._rotate()

        if not self.async_save:
            return _write()

        def _guarded():
            try:
                _write()
            except BaseException as e:  # re-raised from wait()
                self._pending_err = e

        self._pending = threading.Thread(target=_guarded, name=f"ckpt-save-{step}")
        self._pending.start()

    def restore(self, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
        self.wait()
        template = jax.tree.map(np.asarray, template)
        return self._ckptr.restore(os.path.join(self.path(step), "state"), template)

    def restore_raw(self, step: int) -> Dict[str, Any]:
        """Restore the checkpoint tree WITHOUT a template (numpy leaves).

        The template `restore` is for resume, where the caller holds the
        exact live tree. Standalone loaders (eval/export CLIs) only know the
        sub-tree they want — orbax's templated restore REJECTS a partial
        template against a trainer checkpoint that also carries opt_state
        (surfaced r5: export of a real on-chip fine-tune checkpoint), so
        they take the raw tree and pick out what they need."""
        self.wait()
        return self._ckptr.restore(os.path.join(self.path(step), "state"))

    def load_arch_vector(self, step: int) -> Optional[np.ndarray]:
        p = os.path.join(self.path(step), "arch_vector.npy")
        return np.load(p) if os.path.exists(p) else None

    def load_spec_json(self, step: int) -> Optional[str]:
        p = os.path.join(self.path(step), "unet_spec.json")
        if os.path.exists(p):
            with open(p) as f:
                return f.read()
        return None

    def _rotate(self):
        if self.total_limit is None:
            return
        steps = self.all_steps()
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            shutil.rmtree(self.path(victim), ignore_errors=True)


def spec_to_json(spec) -> str:
    """Serialize a UNetSpec (dataclass tree) to JSON."""
    import dataclasses

    def enc(o):
        if dataclasses.is_dataclass(o):
            return {"__cls__": type(o).__name__, **{
                f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)
            }}
        if isinstance(o, tuple):
            return {"__tuple__": [enc(x) for x in o]}
        return o

    return json.dumps(enc(spec))


def spec_from_json(text: str):
    from ..models import unet_spec as us

    classes = {c.__name__: c for c in (us.ResnetSpec, us.TransformerSpec, us.BlockSpec, us.UNetSpec)}

    def dec(o):
        if isinstance(o, dict) and "__tuple__" in o:
            return tuple(dec(x) for x in o["__tuple__"])
        if isinstance(o, dict) and "__cls__" in o:
            cls = classes[o.pop("__cls__")]
            return cls(**{k: dec(v) for k, v in o.items()})
        return o

    return dec(json.loads(text))
