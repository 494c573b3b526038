"""Native (C++) runtime pieces, compiled on demand.

`_image_ops` — fused JPEG decode -> PIL-compatible bilinear resize -> crop ->
hflip with a GIL-releasing thread pool (image_ops.cpp). The reference gets
this for free from torch's C++ DataLoader workers; here the loaders are host
threads, so the decode path itself must drop the GIL to scale.

Build strategy: one `g++ -O3 -shared` invocation against the current
Python/numpy headers + libjpeg, cached next to the source keyed on a source
hash (so edits rebuild, reinstalls don't). No pybind11 (not in the image) —
plain CPython C API. Everything degrades gracefully: `load_image_ops()`
returns None when the toolchain or libjpeg is missing and callers fall back
to PIL.
"""
from __future__ import annotations

import hashlib
import importlib.util
import logging
import os
import subprocess
import sysconfig
import threading

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {"mod": None, "tried": False}


def _source_hash() -> str:
    with open(os.path.join(_HERE, "image_ops.cpp"), "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:12]


def _build(so_path: str) -> None:
    import numpy as np

    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-std=c++17", "-shared", "-fPIC",
        "-pthread", os.path.join(_HERE, "image_ops.cpp"),
        f"-I{py_inc}", f"-I{np_inc}", "-ljpeg", "-o", so_path + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(so_path + ".tmp", so_path)


def load_image_ops():
    """The `_image_ops` extension module, building it on first use; None if
    the build or import fails (callers fall back to PIL)."""
    with _LOCK:
        if _CACHE["tried"]:
            return _CACHE["mod"]
        _CACHE["tried"] = True
        if os.environ.get("UNLEARN_FT_TPU_NO_NATIVE"):
            return None
        try:
            so_path = os.path.join(_HERE, f"_image_ops_{_source_hash()}.so")
            if not os.path.exists(so_path):
                _build(so_path)
            spec = importlib.util.spec_from_file_location("_image_ops", so_path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _CACHE["mod"] = mod
        except Exception as e:  # missing toolchain/libjpeg/etc
            logger.info("native image ops unavailable (%s); using PIL", e)
            _CACHE["mod"] = None
        return _CACHE["mod"]
