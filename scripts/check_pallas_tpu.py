"""Validate + microbenchmark the Pallas census kernel on the real TPU.

Run directly (no env overrides => real chip):
    python scripts/check_pallas_tpu.py [--shape 32 512 432]

Checks forward and backward numerics against the portable scan path
(ops/census.py — itself validated against the reference torch oracle), then
times both.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.ops import census_sad
from depthinspace_tpu.ops.pallas import census_sad_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(8, 128, 144))
    ap.add_argument("--bench-shape", type=int, nargs=3, default=(32, 512, 432))
    args = ap.parse_args()

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())

    rng = np.random.RandomState(0)
    N, H, W = args.shape
    es = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
    ta = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
    g = jnp.asarray(rng.randn(N, H, W).astype(np.float32))

    # ---- forward parity
    ref = np.asarray(census_sad(es, ta, 9, 0.5))
    out = np.asarray(census_sad_pallas(es, ta, 9, 0.5))
    err = np.abs(ref - out).max()
    print(f"forward max abs err: {err:.3e}")
    assert err < 1e-5, "FORWARD MISMATCH"

    # ---- backward parity
    f_ref = jax.jit(jax.grad(lambda e: jnp.sum(census_sad(e, ta, 9, 0.5) * g)))
    f_pal = jax.jit(jax.grad(
        lambda e: jnp.sum(census_sad_pallas(e, ta, 9, 0.5) * g)))
    gr = np.asarray(f_ref(es))
    gp = np.asarray(f_pal(es))
    gerr = np.abs(gr - gp).max()
    print(f"backward max abs err: {gerr:.3e} (scale {np.abs(gr).max():.3e})")
    assert gerr < 1e-5 * max(1.0, float(np.abs(gr).max()) * 10), "BWD MISMATCH"

    # ---- microbenchmark at training shape
    N, H, W = args.bench_shape
    es = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
    ta = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
    g = jnp.asarray(rng.randn(N, H, W).astype(np.float32))

    def bench(fn, label, n=20):
        fn()  # compile
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1e3:.3f} ms")
        return dt

    f1 = jax.jit(lambda: census_sad(es, ta, 9, 0.5))
    f2 = jax.jit(lambda: census_sad_pallas(es, ta, 9, 0.5))
    t_scan = bench(lambda: f1(), "scan fwd")
    t_pal = bench(lambda: f2(), "pallas fwd")

    g1 = jax.jit(jax.grad(lambda e: jnp.sum(census_sad(e, ta, 9, 0.5) * g)))
    g2 = jax.jit(jax.grad(
        lambda e: jnp.sum(census_sad_pallas(e, ta, 9, 0.5) * g)))
    t_scan_b = bench(lambda: g1(es), "scan fwd+bwd")
    t_pal_b = bench(lambda: g2(es), "pallas fwd+bwd")

    print(f"speedup fwd: {t_scan / t_pal:.2f}x   fwd+bwd: "
          f"{t_scan_b / t_pal_b:.2f}x")
    print("OK")


if __name__ == "__main__":
    main()
