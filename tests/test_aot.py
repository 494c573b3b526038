"""utils/aot.py — serialized-executable persistence (bench fast path)."""
import pytest

import os
import tempfile

pytestmark = pytest.mark.fast  # sub-minute unit subset (pre-commit gate)

import jax
import jax.numpy as jnp
import numpy as np

from unlearn_ft_tpu.utils.aot import (
    compile_and_save,
    load_executable,
    save_executable,
    source_fingerprint,
)


def _fn(params, x):
    return {"y": jnp.tanh(x @ params["w"]) + params["b"], "n": jnp.sum(x)}


def test_roundtrip_matches_jit_and_guards_staleness():
    jitted = jax.jit(_fn, donate_argnums=(1,))
    params = {"w": jnp.ones((8, 8)) * 0.1, "b": jnp.zeros((8,))}
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    ref = jax.tree.map(np.asarray, jitted(params, jnp.array(x)))

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "step.exec")
        fp = source_fingerprint(__file__, extra="b8")
        compiled = compile_and_save(jitted, path, params, jnp.array(x), fingerprint=fp)
        out = jax.tree.map(np.asarray, compiled(params, jnp.array(x)))
        jax.tree.map(np.testing.assert_allclose, out, ref)

        # fresh load: callable, same outputs, donation baked in
        loaded = load_executable(path, fingerprint=fp)
        assert loaded is not None
        out2 = jax.tree.map(np.asarray, loaded(params, jnp.array(x)))
        jax.tree.map(np.testing.assert_allclose, out2, ref)

        # guards: wrong fingerprint / missing file / corrupt blob -> None
        assert load_executable(path, fingerprint="something-else") is None
        assert load_executable(os.path.join(tmp, "nope.exec"), fingerprint=fp) is None
        with open(path, "wb") as fh:
            fh.write(b"garbage")
        assert load_executable(path, fingerprint=fp) is None


def test_fingerprint_tracks_sources_and_extra():
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "m.py")
        with open(src, "w") as fh:
            fh.write("A = 1\n")
        a = source_fingerprint(tmp, extra="cfg")
        assert a == source_fingerprint(tmp, extra="cfg")
        assert a != source_fingerprint(tmp, extra="other-cfg")
        with open(src, "w") as fh:
            fh.write("A = 2\n")
        assert a != source_fingerprint(tmp, extra="cfg")


def test_save_sidecar_describes_artifact():
    jitted = jax.jit(lambda x: x * 2)
    x = jnp.ones((4,))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "f.exec")
        meta = save_executable(path, jitted.lower(x).compile(), fingerprint="fp")
        assert meta["fingerprint"] == "fp"
        assert meta["device_kind"] == jax.devices()[0].device_kind
        assert os.path.exists(path + ".json")
