"""Find a TPU-friendly lowering for PointConv's 3x3 stride-2 patch
extraction (the current strided slices lower to ~10 ms serialized gathers
inside the MF step — trace_mf.py, fusenet.py:87).

    python scripts/bench_patches.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

tl, N, H, W, C = 4, 4, 256, 216, 32
ksize, stride = 3, 2
p = (ksize - 1) // 2
ho = (H - 1) // stride + 1
wo = (W - 1) // stride + 1

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(tl, N, H, W, C).astype(np.float32))


def pats_current(x):
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p), (0, 0)])
    pats = []
    for dy in range(ksize):
        for dx in range(ksize):
            pats.append(xp[..., dy:dy + (ho - 1) * stride + 1:stride,
                           dx:dx + (wo - 1) * stride + 1:stride, :])
    out = jnp.stack(pats, axis=-2)
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(*out.shape[:3], ksize * ksize * tl, out.shape[-1])


def pats_s2d(x):
    """space-to-depth: pad to even, reshape (h/2,2,w/2,2), then every
    (dy,dx) offset is a unit-stride slice + parity pick."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p + 2), (p, p + 2), (0, 0)])
    Hp, Wp = H + 2 * p + 2, W + 2 * p + 2   # even
    xr = xp.reshape(tl, N, Hp // 2, 2, Wp // 2, 2, C)
    pats = []
    for dy in range(ksize):
        qy, ry = divmod(dy, 2)
        for dx in range(ksize):
            qx, rx = divmod(dx, 2)
            pats.append(xr[:, :, qy:qy + ho, ry, qx:qx + wo, rx, :])
    out = jnp.stack(pats, axis=-2)
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(*out.shape[:3], ksize * ksize * tl, out.shape[-1])


def pats_s1_then_decimate(x):
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p), (0, 0)])
    pats = []
    for dy in range(ksize):
        for dx in range(ksize):
            pats.append(xp[..., dy:dy + H, dx:dx + W, :])
    out = jnp.stack(pats, axis=-2)           # (tl,N,H,W,9,C)
    out = out[:, :, ::stride, ::stride]
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(*out.shape[:3], ksize * ksize * tl, out.shape[-1])


_reduce = jax.jit(lambda o: o[..., 0].sum())


def _sync(out):
    """Hard device sync WITHOUT hauling the (700 MB) result through the
    axon tunnel — fetch only a dependent scalar from a consumer jit."""
    np.asarray(_reduce(out))


def bench(label, f):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    out = jf(x)
    _sync(out)
    compile_t = time.perf_counter() - t0
    for _ in range(2):
        out = jf(x)
    _sync(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(x)
        _sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:22s} {dt:8.2f} ms   (compile {compile_t:.1f}s) "
          f"shape={out.shape}", flush=True)
    return np.asarray(out)


def pats_stack0(x):
    """stack candidates on axis 0 (contiguous block writes), decimate with
    one strided slice, then one dense transpose to (N,h',w',k2*tl,C)."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p), (0, 0)])
    pats = []
    for dy in range(ksize):
        for dx in range(ksize):
            pats.append(xp[..., dy:dy + H, dx:dx + W, :])
    out = jnp.stack(pats, axis=0)            # (k2,tl,N,H,W,C)
    out = out[:, :, :, ::stride, ::stride]
    out = jnp.transpose(out, (2, 3, 4, 1, 0, 5))  # (N,h,w,tl,k2,C)
    return out.reshape(N, ho, wo, ksize * ksize * tl, C)


def pats_s2d_stack0(x):
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p + 2), (p, p + 2), (0, 0)])
    Hp, Wp = H + 2 * p + 2, W + 2 * p + 2
    xr = xp.reshape(tl, N, Hp // 2, 2, Wp // 2, 2, C)
    pats = []
    for dy in range(ksize):
        qy, ry = divmod(dy, 2)
        for dx in range(ksize):
            qx, rx = divmod(dx, 2)
            pats.append(xr[:, :, qy:qy + ho, ry, qx:qx + wo, rx, :])
    out = jnp.stack(pats, axis=0)            # (k2,tl,N,h,w,C)
    out = jnp.transpose(out, (2, 3, 4, 1, 0, 5))
    return out.reshape(N, ho, wo, ksize * ksize * tl, C)


a = bench("current strided", pats_current)
b = bench("space-to-depth", pats_s2d)
c = bench("s1 + decimate", pats_s1_then_decimate)
d = bench("stack0 + transpose", pats_stack0)
e = bench("s2d stack0 + transp", pats_s2d_stack0)
print("s2d == current:", np.array_equal(a, b))
print("dec == current:", np.array_equal(a, c))
# stack0 merges (tl,k2) same as current's moveaxis ordering? current:
# (tl at -3 via moveaxis) => s = j*k2+k ; stack0 transpose gives (tl,k2)
print("st0 == current:", np.array_equal(a, d))
print("s2d0 == current:", np.array_equal(a, e))
