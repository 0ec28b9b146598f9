"""Minimal repro: gather operand as jit argument vs closed-over constant."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

N, H, W = 32, 512, 432
rng = np.random.RandomState(0)
pat = jnp.asarray(rng.rand(H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))


def bench(label, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:52s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


def xwarp(pat2, d):
    p3 = jnp.broadcast_to(pat2[None], (N, H, W))
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - d, 0.0, W - 1.0)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - jnp.floor(x)
    v0 = jnp.take_along_axis(p3, i0, axis=-1)
    v1 = jnp.take_along_axis(p3, jnp.minimum(i0 + 1, W - 1), axis=-1)
    return v0 * (1 - f) + v1 * f


bench("fwd, pattern as arg", jax.jit(xwarp), pat, disp)
bench("fwd, pattern closed over", jax.jit(lambda d: xwarp(pat, d)), disp)
bench("grad, pattern as arg", jax.jit(
    lambda p_, d: jax.grad(lambda dd: jnp.sum(jnp.sin(xwarp(p_, dd))))(d)),
    pat, disp)
bench("grad, pattern closed over", jax.jit(jax.grad(
    lambda dd: jnp.sum(jnp.sin(xwarp(pat, dd))))), disp)
