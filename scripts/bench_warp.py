"""Microbenchmark alternative warp/gather formulations on TPU.

Decides the implementation strategy for:
  - pattern-by-disparity warp (x-only, border clamp) — photometric loss
  - 2D flow warp (zeros padding) — geometric losses + FuseNet
  - fixed-ratio bilinear resize — model pyramid + FuseNet
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend())

N, H, W = 32, 512, 432
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(0, 100, (N, H, W)).astype(np.float32))
flow = jnp.asarray(rng.uniform(-8, 8, (N, H, W, 2)).astype(np.float32))


def bench(label, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt * 1e3:9.2f} ms")
    return out


# ---------------------------------------------------------------- x-warp
def xwarp_flat(img, disp):
    from depthinspace_tpu.ops import bilinear_sample
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    v = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None],
                         (N, H, W))
    x = u - disp
    return bilinear_sample(img[..., None], x, v, "border")[..., 0]


def xwarp_minor_taa(img, disp):
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - disp, 0.0, W - 1.0)
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, W - 1)
    v0 = jnp.take_along_axis(img, i0, axis=-1)
    v1 = jnp.take_along_axis(img, i1, axis=-1)
    return v0 * (1 - f) + v1 * f


def xwarp_scan(img, disp, dmax=128):
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - disp, 0.0, W - 1.0)
    x0 = jnp.floor(x)
    f = x - x0
    k0 = x0.astype(jnp.int32)
    # pad img on the left so img[:, :, u-k] = slice at offset dmax-k
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (dmax, 1)), mode="edge")

    def body(acc, k):
        sh = lax.dynamic_slice(img_pad, (0, 0, dmax - k), (N, H, W))
        sh1 = lax.dynamic_slice(img_pad, (0, 0, dmax - k + 1), (N, H, W))
        hit = (k0 == k)
        contrib = jnp.where(hit, sh1 * (1 - f) + sh * f, 0.0)
        return acc + contrib, None

    acc, _ = lax.scan(body, jnp.zeros_like(img),
                      jnp.arange(dmax + 1, dtype=jnp.int32))
    return acc


def xwarp_onehot(img, disp, rows_per_block=16):
    """one-hot matmul per row block, lax.map over blocks."""
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    x = jnp.clip(u - disp, 0.0, W - 1.0)
    x0 = jnp.floor(x)
    f = (x - x0).astype(jnp.float32)
    i0 = x0.astype(jnp.int32)

    nb = H // rows_per_block
    img_b = img.reshape(N, nb, rows_per_block, W)
    i0_b = i0.reshape(N, nb, rows_per_block, W)
    f_b = f.reshape(N, nb, rows_per_block, W)

    iota = jnp.arange(W, dtype=jnp.int32)

    def block(args):
        im, i0c, fc = args                      # (N, R, W)
        oh0 = (i0c[..., None] == iota).astype(jnp.float32)      # (N,R,W,Wi)
        oh1 = (jnp.minimum(i0c + 1, W - 1)[..., None] == iota).astype(jnp.float32)
        wmat = oh0 * (1 - fc)[..., None] + oh1 * fc[..., None]
        return jnp.einsum("nrwi,nri->nrw", wmat, im,
                          preferred_element_type=jnp.float32)

    out = lax.map(block, (jnp.moveaxis(img_b, 1, 0),
                          jnp.moveaxis(i0_b, 1, 0),
                          jnp.moveaxis(f_b, 1, 0)))
    return jnp.moveaxis(out, 0, 1).reshape(N, H, W)


a = bench("xwarp flat-gather (current)", jax.jit(xwarp_flat), img, disp)
b = bench("xwarp minor take_along_axis", jax.jit(xwarp_minor_taa), img, disp)
c = bench("xwarp scan-over-disparity", jax.jit(xwarp_scan), img, disp)
d = bench("xwarp one-hot matmul blocks", jax.jit(xwarp_onehot), img, disp)
print("  minor vs flat max err:", float(jnp.abs(a - b).max()))
print("  scan  vs flat max err:", float(jnp.abs(a - c).max()))
print("  onehot vs flat max err:", float(jnp.abs(a - d).max()))

# grad versions
ga = bench("xwarp flat grad", jax.jit(jax.grad(
    lambda d_: jnp.sum(jnp.sin(xwarp_flat(img, d_))))), disp)
gb = bench("xwarp minor grad", jax.jit(jax.grad(
    lambda d_: jnp.sum(jnp.sin(xwarp_minor_taa(img, d_))))), disp)
print("  grad minor vs flat max err:", float(jnp.abs(ga - gb).max()))

# --------------------------------------------------------------- 2D warp
def warp2d_flat(img, flow):
    from depthinspace_tpu.ops import warp
    return warp(img[..., None], flow)[..., 0]


def warp2d_flat2(img, flow):
    """flat gather on (N, H*W) along minor axis."""
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    v = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    x = flow[..., 0] + u
    y = flow[..., 1] + v
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    fx = x - x0; fy = y - y0
    xi0 = x0.astype(jnp.int32); yi0 = y0.astype(jnp.int32)
    flat = img.reshape(N, H * W)

    def corner(yi, xi):
        valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        val = jnp.take_along_axis(flat, idx.reshape(N, -1), axis=-1)
        return val.reshape(N, H, W) * valid
    v00 = corner(yi0, xi0); v01 = corner(yi0, xi0 + 1)
    v10 = corner(yi0 + 1, xi0); v11 = corner(yi0 + 1, xi0 + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


e = bench("2Dwarp 4-corner flat (current)", jax.jit(warp2d_flat), img, flow)
f2 = bench("2Dwarp flat minor-axis", jax.jit(warp2d_flat2), img, flow)
print("  v2 vs v1 max err:", float(jnp.abs(e - f2).max()))

# ---------------------------------------------------------------- resize
def resize_gather(x, h2, w2):
    from depthinspace_tpu.ops import resize_bilinear
    return resize_bilinear(x, h2, w2, align_corners=False)


def _interp_matrix(n_in, n_out, align_corners):
    if align_corners and n_out > 1:
        src = np.linspace(0, n_in - 1, n_out)
    else:
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0, n_in - 1)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = src - i0
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1 - f
    M[np.arange(n_out), i1] += f
    return jnp.asarray(M)


def resize_matmul(x, h2, w2, align_corners=False):
    n, h, w, c = x.shape
    Mh = _interp_matrix(h, h2, align_corners)
    Mw = _interp_matrix(w, w2, align_corners)
    y = jnp.einsum("Hh,nhwc->nHwc", Mh, x, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("Ww,nHwc->nHWc", Mw, y,
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)


x4 = img[..., None]
r1 = bench("resize x2 gather (current)",
           jax.jit(partial(resize_gather, h2=2 * H, w2=2 * W)), x4)
r2 = bench("resize x2 matmul",
           jax.jit(partial(resize_matmul, h2=2 * H, w2=2 * W)), x4)
print("  resize matmul vs gather max err:", float(jnp.abs(r1 - r2).max()))

# ------------------------------------------------------------- smoothness
from depthinspace_tpu.ops import sobel
s1 = bench("sobel 5x5 HIGHEST", jax.jit(lambda a_: sobel(a_, 5)), x4)
