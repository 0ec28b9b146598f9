"""On-TPU validation + bench of the pair-indexed flow warp kernel.

Compares ops/pallas/warp2d_pairs.py (in-kernel source gather) against the
default stacked warp2d_v2 path at the DIS-MF fusion-block shapes, forward
and backward, f32 and bf16.  Run on the real chip:

    python scripts/bench_warp_pairs.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.ops.pallas.warp2d_pairs import warp2d_pairs
from depthinspace_tpu.ops.pallas.warp2d_v2 import warp2d_v2

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)


def bench(label, f, *args, n=20):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])  # hard sync (CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:48s} {dt:9.2f} ms", flush=True)
    return out, dt


def main():
    # DIS-MF fusion-block shape: tl=4 frames x bs=4, core res 256x216,
    # C=32 features; all-pairs layout -> S=16 sources, M=48 pairs.
    tl, bs, H, W, C = 4, 4, 256, 216, 32
    S, M = tl * bs, tl * (tl - 1) * bs
    src_idx = tuple(s * bs + b for t in range(tl) for s in range(tl)
                    if s != t for b in range(bs))
    max_shift = 16

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(S, H, W, C).astype(np.float32))
    flow = jnp.asarray((rng.rand(M, H, W, 2).astype(np.float32) * 2 - 1)
                       * (max_shift - 1))
    idx = jnp.asarray(src_idx)

    def pairs_fwd(x, fl):
        return warp2d_pairs(x, fl, src_idx, max_shift)

    def stacked_fwd(x, fl):
        return warp2d_v2(jnp.take(x, idx, axis=0), fl, max_shift)

    def stacked_fwd_slices(x, fl):
        st = jnp.stack([x[s] for s in src_idx], axis=0)
        return warp2d_v2(st, fl, max_shift)

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        f = feat.astype(dt)
        jp = jax.jit(pairs_fwd)
        js = jax.jit(stacked_fwd_slices)
        a = np.asarray(jp(f, flow), np.float32)
        b = np.asarray(js(f, flow), np.float32)
        err = np.abs(a - b).max()
        print(f"[{dt_name}] fwd max|pairs-stacked| = {err:.3e}", flush=True)
        assert err < (1e-5 if dt == jnp.float32 else 1e-1), err
        _, tp = bench(f"pairs fwd {dt_name}", jp, f, flow)
        _, ts = bench(f"stacked(slices)+v2 fwd {dt_name}", js, f, flow)
        print(f"  -> fwd speedup {ts / tp:.2f}x", flush=True)

        # backward: gradient to feat only (flow is stop_gradient'd in use)
        def loss_p(x):
            return jnp.sum(pairs_fwd(x, flow).astype(jnp.float32) ** 2)

        def loss_s(x):
            return jnp.sum(stacked_fwd_slices(x, flow)
                           .astype(jnp.float32) ** 2)

        gp_f = jax.jit(jax.grad(loss_p))
        gs_f = jax.jit(jax.grad(loss_s))
        ga = np.asarray(gp_f(f), np.float32)
        gb = np.asarray(gs_f(f), np.float32)
        ref = np.abs(gb).max() + 1e-6
        gerr = np.abs(ga - gb).max() / ref
        print(f"[{dt_name}] bwd rel max err = {gerr:.3e}", flush=True)
        assert gerr < (1e-4 if dt == jnp.float32 else 5e-2), gerr
        _, tpg = bench(f"pairs bwd {dt_name}", gp_f, f)
        _, tsg = bench(f"stacked bwd {dt_name}", gs_f, f)
        print(f"  -> bwd speedup {tsg / tpg:.2f}x", flush=True)

    print("warp2d_pairs validated on", jax.default_backend(), flush=True)


if __name__ == "__main__":
    main()
