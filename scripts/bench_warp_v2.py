"""Compare warp2d v1 vs v2 on TPU at the FuseNet feature-warp shapes.

    python scripts/bench_warp_v2.py [M H W C n_iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    a = sys.argv[1:]
    M = int(a[0]) if len(a) > 0 else 48
    H = int(a[1]) if len(a) > 1 else 256
    W = int(a[2]) if len(a) > 2 else 216
    C = int(a[3]) if len(a) > 3 else 32
    n = int(a[4]) if len(a) > 4 else 20

    import jax
    import jax.numpy as jnp
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.ops.pallas.warp_kernel import warp2d
    from depthinspace_tpu.ops.pallas.warp2d_v2 import warp2d_v2

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} M={M} H={H} W={W} C={C}")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))
    # flow field: smooth base + noise, magnitudes ~ a few px (typical of
    # half-res core flows)
    base = rng.uniform(-4, 4, (M, 1, 1, 2)).astype(np.float32)
    flow = jnp.asarray(base + rng.uniform(-2, 2, (M, H, W, 2))
                       .astype(np.float32))
    g = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))

    def timeit(label, f, *args):
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label}: {dt:8.2f} ms")
        return out

    f1 = jax.jit(lambda i, fl: warp2d(i, fl, 16))
    f2 = jax.jit(lambda i, fl: warp2d_v2(i, fl, 16))
    o1 = timeit("fwd v1", f1, img, flow)
    o2 = timeit("fwd v2", f2, img, flow)
    print("fwd max|v2-v1|:", float(jnp.max(jnp.abs(o2 - o1))))

    b1 = jax.jit(lambda i, fl, gg: jax.vjp(lambda x: warp2d(x, fl, 16),
                                           i)[1](gg)[0])
    b2 = jax.jit(lambda i, fl, gg: jax.vjp(lambda x: warp2d_v2(x, fl, 16),
                                           i)[1](gg)[0])
    g1 = timeit("bwd v1", b1, img, flow, g)
    g2 = timeit("bwd v2", b2, img, flow, g)
    print("bwd max|v2-v1|:", float(jnp.max(jnp.abs(g2 - g1))))

    # bf16-native v2 (incl. the f32<->bf16 round-trip copies the old path
    # paid outside the kernel, for an apples-to-apples FuseNet comparison)
    img16, g16 = img.astype(jnp.bfloat16), g.astype(jnp.bfloat16)
    f2_rt = jax.jit(lambda i, fl: warp2d_v2(
        i.astype(jnp.float32), fl, 16).astype(jnp.bfloat16))
    f2_16 = jax.jit(lambda i, fl: warp2d_v2(i, fl, 16))
    o_rt = timeit("fwd v2 bf16-via-f32", f2_rt, img16, flow)
    o_16 = timeit("fwd v2 bf16-native ", f2_16, img16, flow)
    print("fwd max|native-roundtrip|:",
          float(jnp.max(jnp.abs(o_16.astype(jnp.float32)
                                - o_rt.astype(jnp.float32)))))
    b2_rt = jax.jit(lambda i, fl, gg: jax.vjp(
        lambda x: warp2d_v2(x.astype(jnp.float32), fl, 16)
        .astype(jnp.bfloat16), i)[1](gg)[0])
    b2_16 = jax.jit(lambda i, fl, gg: jax.vjp(
        lambda x: warp2d_v2(x, fl, 16), i)[1](gg)[0])
    g_rt = timeit("bwd v2 bf16-via-f32", b2_rt, img16, flow, g16)
    g_16 = timeit("bwd v2 bf16-native ", b2_16, img16, flow, g16)
    print("bwd max|native-roundtrip|:",
          float(jnp.max(jnp.abs(g_16.astype(jnp.float32)
                                - g_rt.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
