"""Validate + bench the Pallas warp kernels against the gather reference."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.ops import bilinear_sample
from depthinspace_tpu.ops.pallas import xwarp_disparity, warp2d

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)


def bench(label, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:42s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)
    return out


# ---------------- xwarp: correctness on small, bench at full shape
rng = np.random.RandomState(0)
N, H, W = 4, 64, 128
pat = jnp.asarray(np.broadcast_to(rng.rand(H, W), (N, H, W)).astype(np.float32).copy())
disp = jnp.asarray((rng.uniform(0, 60, (N, H, W)) + 0.3).astype(np.float32))
g = jnp.asarray(rng.randn(N, H, W).astype(np.float32))

u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
v = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None], (N, H, W))
ref = bilinear_sample(pat[..., None], u - disp, v, "border")[..., 0]
out = xwarp_disparity(pat, disp, 128)
err = float(jnp.abs(ref - out).max())
print("xwarp fwd max err:", err, flush=True)
assert err < 1e-5

g_ref = jax.grad(lambda d: jnp.sum(
    bilinear_sample(pat[..., None], u - d, v, "border")[..., 0] * g))(disp)
g_pal = jax.grad(lambda d: jnp.sum(xwarp_disparity(pat, d, 128) * g))(disp)
gerr = float(jnp.abs(g_ref - g_pal).max())
print("xwarp grad max err:", gerr, flush=True)
assert gerr < 1e-4

# ---------------- warp2d correctness
flow = jnp.asarray(rng.uniform(-7.5, 7.5, (N, H, W, 2)).astype(np.float32))
img = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
uu = jnp.arange(W, dtype=jnp.float32)[None, None, :]
vv = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None], (N, H, W))
ref2 = bilinear_sample(img[..., None], flow[..., 0] + uu, flow[..., 1] + vv,
                       "zeros")[..., 0]
out2 = warp2d(img[..., None], flow, 16)[..., 0]
err2 = float(jnp.abs(ref2 - out2).max())
print("warp2d fwd max err:", err2, flush=True)
assert err2 < 1e-5

gi_ref = jax.grad(lambda im: jnp.sum(bilinear_sample(
    im[..., None], flow[..., 0] + uu, flow[..., 1] + vv, "zeros")[..., 0] * g))(img)
gi_pal = jax.grad(lambda im: jnp.sum(warp2d(im[..., None], flow, 16)[..., 0] * g))(img)
gierr = float(jnp.abs(gi_ref - gi_pal).max())
print("warp2d grad-img max err:", gierr, flush=True)
assert gierr < 1e-4

# flow cotangent is zeros by design (flow is always input data here)
gf_pal = jax.grad(lambda fl: jnp.sum(warp2d(img[..., None], fl, 16) * g[..., None]))(flow)
assert float(jnp.abs(gf_pal).max()) == 0.0
print("warp2d flow cotangent: zeros (by design)", flush=True)

# ---------------- bench at training shapes
N, H, W = 32, 512, 432
pat = jnp.asarray(np.broadcast_to(rng.rand(H, W), (N, H, W)).astype(np.float32).copy())
disp = jnp.asarray(rng.uniform(0, 100, (N, H, W)).astype(np.float32))
g = jnp.asarray(rng.randn(N, H, W).astype(np.float32))
bench("xwarp fwd (32,512,432)", jax.jit(lambda d: xwarp_disparity(pat, d, 128)), disp)
bench("xwarp fwd+bwd", jax.jit(jax.grad(
    lambda d: jnp.sum(xwarp_disparity(pat, d, 128) * g))), disp)

M = 8
img = jnp.asarray(rng.rand(M, H, W).astype(np.float32))
flow = jnp.asarray(rng.uniform(-7, 7, (M, H, W, 2)).astype(np.float32))
gm = jnp.asarray(rng.randn(M, H, W).astype(np.float32))
bench("warp2d fwd C=1 (8,512,432) D=16",
      jax.jit(lambda f: warp2d(img[..., None], f, 16)), flow)
bench("warp2d fwd+bwd img grad C=1", jax.jit(jax.grad(
    lambda im: jnp.sum(warp2d(im[..., None], flow, 16)[..., 0] * gm))), img)
img4 = jnp.stack([img, img * 0.5, img + 1, img * 2], axis=-1)
gm4 = jnp.stack([gm] * 4, axis=-1)
bench("warp2d fwd C=4 (8,512,432) D=16",
      jax.jit(lambda f: warp2d(img4, f, 16)), flow)
bench("warp2d fwd+bwd img grad C=4", jax.jit(jax.grad(
    lambda im: jnp.sum(warp2d(im, flow, 16) * gm4))), img4)
# multi-channel correctness
o4 = warp2d(img4[:2, :64, :128], flow[:2, :64, :128], 16)
r4 = jnp.stack([bilinear_sample(img4[:2, :64, :128, c:c+1],
                                flow[:2, :64, :128, 0] + uu[:, :, :128][:, :64],
                                flow[:2, :64, :128, 1] + vv[:2, :64, :128],
                                "zeros")[..., 0] for c in range(4)], -1)
print("warp2d C=4 max err:", float(jnp.abs(o4 - r4).max()), flush=True)
print("OK", flush=True)
