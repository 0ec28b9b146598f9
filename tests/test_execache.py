"""Cross-process executable cache (utils/execache.py).

No reference counterpart (the reference recompiles nothing); this covers
the DIS_EXEC_CACHE opt-in wiring in train/steps.py::build_steps.

The cache-hit deserialize path is exercised here with a spy around
``serialize_executable.deserialize_and_load``: XLA:CPU AOT
deserialization is unreliable on this host (machine-feature mismatch —
the reason cache_dir() gates itself off on the CPU backend), so the
end-to-end restore is validated on the real TPU by
scripts/aot_persist_probe.py (save 133 s compile / load 20.5 s + 15.2 s
first run for the full 512x432 SF train step, round 5).
"""

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils import execache


def _force(monkeypatch, tmp_path):
    monkeypatch.setenv("DIS_EXEC_CACHE", str(tmp_path))
    monkeypatch.setenv("DIS_EXEC_CACHE_FORCE", "1")


def test_cpu_gate(tmp_path, monkeypatch):
    monkeypatch.setenv("DIS_EXEC_CACHE", str(tmp_path))
    monkeypatch.delenv("DIS_EXEC_CACHE_FORCE", raising=False)
    assert execache.cache_dir() is None  # tests run on the CPU backend
    monkeypatch.setenv("DIS_EXEC_CACHE_FORCE", "1")
    assert execache.cache_dir() == tmp_path


def test_cache_write_then_hit(tmp_path, monkeypatch):
    _force(monkeypatch, tmp_path)

    def f(x, y):
        return jnp.tanh(x @ y).sum(axis=1)

    args = (jnp.ones((16, 16)), jnp.ones((16, 16)))
    c1 = execache.cached_compile(jax.jit(f), args, tag="t")
    entries = list(tmp_path.glob("t-*.jexec"))
    assert len(entries) == 1 and entries[0].stat().st_size > 0
    # payload sanity: (serialize() tuple, original device ids)
    payload, device_ids = pickle.loads(entries[0].read_bytes())
    assert device_ids == [d.id for d in
                          c1._executable.xla_executable.local_devices()]

    # second compile of the same program must resolve through
    # deserialize_and_load with the recorded devices, not recompile
    calls = {}

    def spy(*payload_args, execution_devices=None):
        calls["devices"] = [d.id for d in execution_devices]
        return c1

    from jax.experimental import serialize_executable as se
    monkeypatch.setattr(se, "deserialize_and_load", spy)
    c2 = execache.cached_compile(jax.jit(f), args, tag="t")
    assert c2 is c1 and calls["devices"] == device_ids
    assert list(tmp_path.glob("t-*.jexec")) == entries  # no second entry
    np.testing.assert_allclose(np.asarray(c1(*args)),
                               np.asarray(jax.jit(f)(*args)))


def test_corrupt_entry_falls_back(tmp_path, monkeypatch):
    _force(monkeypatch, tmp_path)

    def f(x):
        return x * 2.0

    args = (jnp.arange(8.0),)
    execache.cached_compile(jax.jit(f), args, tag="c")
    entry = next(tmp_path.glob("c-*.jexec"))
    entry.write_bytes(b"garbage")
    c = execache.cached_compile(jax.jit(f), args, tag="c")
    np.testing.assert_allclose(np.asarray(c(*args)), np.arange(8.0) * 2.0)


def test_caching_jit_distinguishes_none_structure(tmp_path, monkeypatch):
    _force(monkeypatch, tmp_path)

    def f(pair):
        a, b = pair
        base = a * 3.0
        return base if b is None else base + b

    cj = execache.CachingJit(jax.jit(f), tag="s")
    x = jnp.ones((4,))
    # same leaf shapes, different treedef (None placement) -> distinct
    # programs; a leaves-only signature would collide
    out1 = np.asarray(cj((x, None)))
    out2 = np.asarray(cj((x, x)))
    np.testing.assert_allclose(out1, 3.0 * np.ones(4))
    np.testing.assert_allclose(out2, 4.0 * np.ones(4))
    assert len(cj._compiled) == 2


def test_no_env_means_plain_compile(monkeypatch):
    monkeypatch.delenv("DIS_EXEC_CACHE", raising=False)
    assert execache.cache_dir() is None

    def f(x):
        return x + 1

    c = execache.cached_compile(jax.jit(f), (jnp.zeros(4),), tag="p")
    np.testing.assert_allclose(np.asarray(c(jnp.zeros(4))), np.ones(4))
