"""A/B the packed-conv lowering options at the fusion-block shape.

Full-step A/B showed feature_group_count=4 grouped convs made the packed
FuseNet SLOWER (1569 vs 1232 ms/step).  Isolate why: compare, for the
same logical work (16 frames x C=32 3x3 conv at 256x216),

  separate : (16, 256, 216, 32)  dense conv          (the baseline)
  grouped  : (4, 256, 216, 128)  feature_group_count=4, tiled weights
  blockdiag: (4, 256, 216, 128)  dense conv, block-diagonal weights
             (4x the FLOPs, but the C=128 path measured 72% MXU)

    python scripts/bench_conv_grouped.py
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
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    G, N, H, W, C = 4, 4, 256, 216, 32
    L = 8
    rng = np.random.RandomState(0)
    ws = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05,
                      jnp.bfloat16) for _ in range(L)]
    eye = jnp.eye(G, dtype=jnp.bfloat16)

    def selu(x):
        return 1.0507 * jnp.where(x > 0, x, 1.6733 * (jnp.exp(x) - 1.0))

    @jax.jit
    def separate(x, ws):                      # (G*N, H, W, C)
        for w in ws:
            x = selu(lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def grouped(x, ws):                       # (N, H, W, G*C)
        for w in ws:
            wt = jnp.tile(w, (1, 1, 1, G))
            x = selu(lax.conv_general_dilated(
                x, wt, (1, 1), "SAME", feature_group_count=G,
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def blockdiag(x, ws):                     # (N, H, W, G*C)
        for w in ws:
            bd = jnp.einsum("hwio,gG->hwgiGo", w, eye)
            bd = bd.reshape(3, 3, G * C, G * C)
            x = selu(lax.conv_general_dilated(
                x, bd, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.sum(x.astype(jnp.float32))

    x_sep = jnp.asarray(rng.rand(G * N, H, W, C).astype(np.float32),
                        jnp.bfloat16)
    x_pack = jnp.moveaxis(x_sep.reshape(G, N, H, W, C), 0, 3).reshape(
        N, H, W, G * C)

    base_flop = G * N * H * W * C * C * 9 * 2 * L
    for name, fn, x in (("separate ", separate, x_sep),
                        ("grouped  ", grouped, x_pack),
                        ("blockdiag", blockdiag, x_pack)):
        dt = timeit(fn, x, ws)
        print(f"{name}: {dt*1e3:.3f} ms / {L} layers  "
              f"({base_flop/dt/1e12:.1f} useful TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
