"""AOT executable cache: save/load round-trip and failure modes.

The save-exe/load-exe analog (reference: src/ipu_utils.hpp:30-55,
232-255,483-521) - compiled programs must reload without recompiling,
reject empty manifests, and fall back to JIT when a loaded program's
avals no longer match.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipu_path_trace_tpu.runtime.exe_cache import ProgramManager


def _fn(x, y):
    return x * 2.0 + y


def test_save_load_roundtrip(tmp_path):
    pm = ProgramManager()
    pm.add("double_add", jax.jit(_fn))
    x = jnp.arange(8.0)
    y = jnp.ones((8,))
    prefix = str(tmp_path / "exe")
    pm.save(prefix, {"double_add": (x, y)})

    pm2 = ProgramManager()
    pm2.add("double_add", jax.jit(_fn))
    assert pm2.load(prefix)
    out = pm2.run("double_add", x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1)
    # The loaded program (not the jitted fallback) served the call:
    assert "double_add" in pm2._loaded


def test_load_rejects_missing_and_empty_manifest(tmp_path):
    pm = ProgramManager()
    assert not pm.load(str(tmp_path / "nope"))
    empty = tmp_path / "empty"
    (tmp_path / "empty.json").write_text(json.dumps({"programs": {}}))
    assert not pm.load(str(empty))


def test_aval_mismatch_falls_back_to_jit(tmp_path):
    pm = ProgramManager()
    pm.add("double_add", jax.jit(_fn))
    prefix = str(tmp_path / "exe")
    pm.save(prefix, {"double_add": (jnp.arange(8.0), jnp.ones((8,)))})

    pm2 = ProgramManager()
    pm2.add("double_add", jax.jit(_fn))
    assert pm2.load(prefix)
    # Different shape than the exported specialisation -> JIT fallback:
    x = jnp.arange(16.0)
    out = pm2.run("double_add", x, jnp.ones((16,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 1)
    assert "double_add" not in pm2._loaded  # evicted after rejection


def test_duplicate_program_name_rejected():
    pm = ProgramManager()
    pm.add("p", jax.jit(_fn))
    with pytest.raises(ValueError):
        pm.add("p", jax.jit(_fn))
