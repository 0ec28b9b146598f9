"""A/B: NHWC vs NCHW conv stacks at the FuseNet fusion-block shape.

The compiled MF step shows ~70 layout copies of bf16[16,256,216,32]
(~5.6 ms each) around the fusion-block convs: XLA picks a W-on-lanes
layout {2,1,3,0} for the C=32 bf16 convs but the surrounding elementwise
fusions produce/consume the C-on-lanes default — every conv boundary pays
a 56 MB transpose.  Hypothesis: expressing the convs NCHW makes the
default row-major layout (W minor -> lanes, H sublanes) BE the conv
layout, so elementwise ops share it and the copies vanish.

    python scripts/bench_conv_layout.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()

    N, H, W, C = 16, 256, 216, 32
    L = 8                            # conv+selu layers
    rng = np.random.RandomState(0)
    w_hwio = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05,
                          jnp.bfloat16) for _ in range(L)]

    def selu(x):
        return 1.0507 * jnp.where(x > 0, x, 1.6733 * (jnp.exp(x) - 1.0))

    @jax.jit
    def nhwc(x, ws):
        for w in ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            x = selu(x)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def nchw(x, ws):
        for w in ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"),
                preferred_element_type=jnp.bfloat16)
            x = selu(x)
        return jnp.sum(x.astype(jnp.float32))

    x_nhwc = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32),
                         jnp.bfloat16)
    x_nchw = jnp.moveaxis(x_nhwc, -1, 1)

    for name, fn, x in (("nhwc", nhwc, x_nhwc), ("nchw", nchw, x_nchw)):
        out = fn(x, w_hwio)
        np.asarray(out)
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            out = fn(x, w_hwio)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:.3f} ms for {L} conv+selu layers "
              f"({dt * 1e3 / L:.3f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
