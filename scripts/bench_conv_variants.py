"""Probe conv formulations at the FuseNet fusion-block shape (C=32).

NHWC bf16 3x3 convs at (16,256,216,32) measure ~1.48 ms vs a 0.083 ms
MXU floor (~6% MFU).  Variants measured here, all computing the same
8-layer conv+selu chain:
  - f32 conv (no (2,1) bf16 packing in the layout)
  - C=64 / C=128 bf16 (does efficiency scale with channel count?)
  - tap-sum matmuls: y = sum_k shift_k(x) @ W[k] as 9 dot_generals
  - merged-frame width: (1, 256, 216*16, 32) — W*N on lanes

    python scripts/bench_conv_variants.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, *args, reps=30):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    N, H, W = 16, 256, 216
    L = 8
    rng = np.random.RandomState(0)

    def selu(x):
        return 1.0507 * jnp.where(x > 0, x, 1.6733 * (jnp.exp(x) - 1.0))

    def make(C, dtype):
        ws = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05,
                          dtype) for _ in range(L)]
        x = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32), dtype)
        return x, ws

    @partial(jax.jit, static_argnums=())
    def chain(x, ws):
        for w in ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            x = selu(x)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def chain_tapsum(x, ws):
        n, h, w_, c = x.shape
        for w in ws:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, dy:dy + h, dx:dx + w_, :]
                    term = jnp.einsum("nhwc,cd->nhwd", sl, w[dy, dx],
                                      preferred_element_type=x.dtype)
                    acc = term if acc is None else acc + term
            x = selu(acc)
        return jnp.sum(x.astype(jnp.float32))

    base_flop = N * H * W * 32 * 32 * 9 * 2 * L

    x, ws = make(32, jnp.bfloat16)
    dt = timeit(chain, x, ws)
    print(f"bf16 C=32 conv   : {dt*1e3:.3f} ms  "
          f"({base_flop/dt/1e12:.1f} TFLOP/s)", flush=True)

    dt = timeit(chain_tapsum, x, ws)
    print(f"bf16 C=32 tapsum : {dt*1e3:.3f} ms  "
          f"({base_flop/dt/1e12:.1f} TFLOP/s)", flush=True)

    xf, wsf = make(32, jnp.float32)
    dt = timeit(chain, xf, wsf)
    print(f"f32  C=32 conv   : {dt*1e3:.3f} ms  "
          f"({base_flop/dt/1e12:.1f} TFLOP/s)", flush=True)

    for C in (64, 128):
        xc, wsc = make(C, jnp.bfloat16)
        dt = timeit(chain, xc, wsc)
        fl = N * H * W * C * C * 9 * 2 * L
        print(f"bf16 C={C} conv  : {dt*1e3:.3f} ms  "
              f"({fl/dt/1e12:.1f} TFLOP/s)", flush=True)

    # merged width: N folded into W -> lanes see 216*16 contiguous pixels
    xm = jnp.moveaxis(x, 0, 2).reshape(1, H, W * N, 32)
    dt = timeit(chain, xm, ws)
    print(f"bf16 C=32 conv (1,{H},{W*N},32): {dt*1e3:.3f} ms "
          f"(junk at seams; layout probe only)", flush=True)


if __name__ == "__main__":
    main()
