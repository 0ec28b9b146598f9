"""Pin down the fast formulation for the x-only pattern warp on TPU."""
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
pattern2d = jnp.asarray(rng.rand(H, W).astype(np.float32))
pattern3d = jnp.asarray(np.broadcast_to(rng.rand(H, W), (N, H, W)).astype(np.float32).copy())
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))


def bench(label, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:44s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)
    return out


def idx_of(disp):
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - disp, 0.0, W - 1.0)
    x0 = jnp.floor(x)
    return x0.astype(jnp.int32), x - x0


def v1_args3d(pat, disp):
    i0, f = idx_of(disp)
    i1 = jnp.minimum(i0 + 1, W - 1)
    v0 = jnp.take_along_axis(pat, i0, axis=-1)
    v1 = jnp.take_along_axis(pat, i1, axis=-1)
    return v0 * (1 - f) + v1 * f


def v2_broadcast2d(pat2, disp):
    pat = jnp.broadcast_to(pat2[None], (N, H, W))
    return v1_args3d(pat, disp)


def v3_production(pat2, disp):
    from depthinspace_tpu.losses.photometric import warp_pattern_by_disparity
    return warp_pattern_by_disparity(pat2, disp)


o1 = bench("v1 take_along_axis, real (N,H,W) arg", jax.jit(v1_args3d),
           pattern3d, disp)
o2 = bench("v2 take_along_axis, broadcast of 2D", jax.jit(v2_broadcast2d),
           pattern2d, disp)
o3 = bench("v3 production custom-vjp warp", jax.jit(v3_production),
           pattern2d, disp)
print("  v2 vs v1:", float(jnp.abs(o1 - o2).max()), flush=True)

# grad of production path
bench("v3 grad wrt disp", jax.jit(jax.grad(
    lambda d: jnp.sum(jnp.sin(v3_production(pattern2d, d))))), disp)
