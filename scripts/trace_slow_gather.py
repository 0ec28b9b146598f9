"""Capture a device trace of the slow grad-warp case and list top ops."""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()

N, H, W = 32, 512, 432
rng = np.random.RandomState(0)
pat = jnp.asarray(rng.rand(H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))


def xwarp(pat2, d):
    p3 = jnp.broadcast_to(pat2[None], (N, H, W))
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - d, 0.0, W - 1.0)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - jnp.floor(x)
    v0 = jnp.take_along_axis(p3, i0, axis=-1)
    v1 = jnp.take_along_axis(p3, jnp.minimum(i0 + 1, W - 1), axis=-1)
    return v0 * (1 - f) + v1 * f


slow = jax.jit(lambda p_, d: jax.grad(
    lambda dd: jnp.sum(jnp.sin(xwarp(p_, dd))))(d))
slow(pat, disp).block_until_ready()

logdir = "/tmp/dis_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        out = slow(pat, disp)
    out.block_until_ready()

# parse the trace
files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for fp in files:
    with gzip.open(fp, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 500]
    events.sort(key=lambda e: -e["dur"])
    seen = set()
    for e in events[:40]:
        name = e.get("name", "?")
        if name in seen:
            continue
        seen.add(name)
        print(f"{e['dur'] / 1e3:10.2f} ms  {name[:140]}")
