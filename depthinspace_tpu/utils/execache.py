"""Cross-process compiled-executable cache for jitted step programs.

Why this exists: on this backend the XLA *persistent compile cache* is
keyed per-process (identical HLO digests map to distinct cache entries —
per-session metadata rides in the compile options; CLAUDE.md), so every
new Python process pays the full remote-compile-service round trip
(minutes for the big step programs) plus the executable load for every
program it runs.  ``jax.experimental.serialize_executable`` side-steps
that cache entirely: it pickles the *loaded* executable, and
``deserialize_and_load`` restores it in a later process without any
compile-service round trip (measured: scripts/aot_persist_probe.py —
the full 512x432 DIS-SF train step restores in seconds vs a ~130 s
compile + multi-minute first-call stall).

The cache is opt-in via ``DIS_EXEC_CACHE=<dir>`` (no reference
counterpart — the reference recompiles nothing, reference
train_val.py:49-59 builds eager torch modules).  Keys cover the lowered
HLO text, jax version, platform, device kind and device count, so a
stale entry can only be hit by a genuinely identical program on the
same topology; deserialization failures fall back to a fresh compile.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import time
from pathlib import Path


def cache_dir() -> Path | None:
    d = os.environ.get("DIS_EXEC_CACHE", "")
    if not d:
        return None
    if os.environ.get("DIS_EXEC_CACHE_FORCE", "") != "1":
        # XLA:CPU AOT deserialization is unreliable (machine-feature
        # mismatch between the in-process JIT target and the AOT loader;
        # deserialized executables produce dead result buffers on this
        # host).  The cache targets the TPU remote-compile problem; only
        # engage it there unless explicitly forced.
        import jax

        if jax.devices()[0].platform == "cpu":
            return None
    return Path(d)


def _key(lowered, tag: str) -> str:
    import jax

    dev = jax.devices()[0]
    meta = "|".join([
        jax.__version__, dev.platform,
        getattr(dev, "device_kind", ""), str(len(jax.devices())), tag,
    ])
    h = hashlib.sha256(meta.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:24]


def cached_compile(jitfn, args, tag: str = "fn"):
    """``jitfn.lower(*args).compile()`` with cross-process executable reuse.

    ``jitfn`` must be a ``jax.jit`` object (donation baked in); ``args``
    concrete arrays or ShapeDtypeStructs.  Returns the ``Compiled``
    executable.  Without ``DIS_EXEC_CACHE`` this is a plain AOT compile.
    """
    lowered = jitfn.lower(*args)
    d = cache_dir()
    if d is None:
        return lowered.compile()

    from jax.experimental import serialize_executable as se

    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{tag}-{_key(lowered, tag)}.jexec"
    if path.exists():
        t0 = time.time()
        try:
            import jax

            payload, device_ids = pickle.loads(path.read_bytes())
            # deserialize_and_load defaults execution_devices to ALL of the
            # client's devices; restore onto the executable's original
            # device assignment (matters on multi-device hosts, e.g. the
            # 8-virtual-CPU test mesh)
            by_id = {dev.id: dev for dev in jax.devices()}
            devs = [by_id[i] for i in device_ids]
            compiled = se.deserialize_and_load(*payload,
                                               execution_devices=devs)
            logging.info(f"execache hit {path.name} "
                         f"({time.time() - t0:.1f}s load)")
            return compiled
        except Exception as e:  # version skew, torn write, topology change
            logging.warning(f"execache entry {path.name} unusable ({e}); "
                            "recompiling")
            path.unlink(missing_ok=True)
    t0 = time.time()
    compiled = lowered.compile()
    logging.info(f"execache miss {tag}: compiled in {time.time() - t0:.1f}s")
    try:
        device_ids = [dev.id for dev in
                      compiled._executable.xla_executable.local_devices()]
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_bytes(pickle.dumps((se.serialize(compiled), device_ids)))
        tmp.replace(path)  # atomic: concurrent readers never see a torn file
    except Exception as e:
        logging.warning(f"execache write failed for {tag}: {e}")
    return compiled


class CachingJit:
    """Lazy AOT wrapper: first call per input-shape signature lowers the
    program and resolves it through :func:`cached_compile`; later calls
    dispatch straight to the compiled executable.

    Used by train/steps.py::build_steps when ``DIS_EXEC_CACHE`` is set so
    worker processes (pipeline stages, bench, presave) skip recompiles of
    programs any earlier process already built.  Transparent otherwise.
    """

    def __init__(self, jitfn, tag: str):
        self._jit = jitfn
        self._tag = tag
        self._compiled = {}

    @staticmethod
    def _sig(args):
        import jax

        leaves, treedef = jax.tree.flatten(args)
        # treedef distinguishes signatures that differ only in WHICH
        # optional Batch fields are None (same leaf shapes, different
        # program — e.g. pseudo_gt-only vs sgm_disp-only)
        return (str(treedef),
                tuple((x.shape, str(x.dtype)) for x in leaves))

    def __call__(self, *args):
        sig = self._sig(args)
        fn = self._compiled.get(sig)
        if fn is None:
            fn = cached_compile(self._jit, args, self._tag)
            self._compiled[sig] = fn
        return fn(*args)

    # cost-analysis hooks used by bench.py keep working
    def lower(self, *args):
        return self._jit.lower(*args)
