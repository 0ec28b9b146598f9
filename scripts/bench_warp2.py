"""Phase-2 warp bench: gradients of the one-hot path + scan-over-dy 2D warp."""
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
print("backend:", jax.default_backend(), flush=True)

N, H, W = 32, 512, 432
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))
flow = jnp.asarray(rng.uniform(-8, 8, (N, H, W, 2)).astype(np.float32))


def bench(label, f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:46s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)
    return out


ROWS = 16
IOTA = jnp.arange(W, dtype=jnp.int32)


def row_sample_border(img, x):
    """img (N,H,Wi), x (N,H,Wo) -> img sampled along rows, border clamp.
    One-hot matmul formulation: AD gives einsum-based grads (no scatter)."""
    x = jnp.clip(x, 0.0, W - 1.0)
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, W - 1)

    nb = H // ROWS
    img_b = jnp.moveaxis(img.reshape(N, nb, ROWS, W), 1, 0)
    i0_b = jnp.moveaxis(i0.reshape(N, nb, ROWS, W), 1, 0)
    i1_b = jnp.moveaxis(i1.reshape(N, nb, ROWS, W), 1, 0)
    f_b = jnp.moveaxis(f.reshape(N, nb, ROWS, W), 1, 0)

    def block(args):
        im, i0c, i1c, fc = args
        w0 = (i0c[..., None] == IOTA).astype(jnp.float32) * (1 - fc)[..., None]
        w1 = (i1c[..., None] == IOTA).astype(jnp.float32) * fc[..., None]
        return jnp.einsum("nrwi,nri->nrw", w0 + w1, im,
                          preferred_element_type=jnp.float32)

    out = lax.map(block, (img_b, i0_b, i1_b, f_b))
    return jnp.moveaxis(out, 0, 1).reshape(N, H, W)


bench("onehot xwarp fwd", jax.jit(
    lambda d: row_sample_border(img, jnp.arange(W, dtype=jnp.float32)[None, None] - d)),
      disp)
bench("onehot xwarp grad wrt disp", jax.jit(jax.grad(
    lambda d: jnp.sum(jnp.sin(row_sample_border(
        img, jnp.arange(W, dtype=jnp.float32)[None, None] - d))))), disp)
bench("onehot xwarp grad wrt img", jax.jit(jax.grad(
    lambda im_: jnp.sum(jnp.sin(row_sample_border(
        im_, jnp.arange(W, dtype=jnp.float32)[None, None] - disp))))), img)


def warp2d_scan(img, flow, max_dy=16):
    """zeros-padding 2D warp: scan over integer row offsets + row resample."""
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    v = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    x = flow[..., 0] + u
    y = flow[..., 1] + v
    y0 = jnp.floor(y)
    fy = y - y0
    y0i = y0.astype(jnp.int32)
    rows = jnp.arange(H, dtype=jnp.int32)[None, :, None]

    # x resample with zeros semantics: unclipped one-hot -> no match = 0
    x0 = jnp.floor(x)
    fx = x - x0
    i0 = x0.astype(jnp.int32)

    nb = H // ROWS

    def xsample(im):
        im_b = jnp.moveaxis(im.reshape(N, nb, ROWS, W), 1, 0)
        i0_b = jnp.moveaxis(i0.reshape(N, nb, ROWS, W), 1, 0)
        f_b = jnp.moveaxis(fx.reshape(N, nb, ROWS, W), 1, 0)

        def block(args):
            imc, i0c, fc = args
            w0 = ((i0c[..., None] == IOTA).astype(jnp.float32)
                  * (1 - fc)[..., None])
            w1 = (((i0c + 1)[..., None] == IOTA).astype(jnp.float32)
                  * fc[..., None])
            return jnp.einsum("nrwi,nri->nrw", w0 + w1, imc,
                              preferred_element_type=jnp.float32)
        out = lax.map(block, (im_b, i0_b, f_b))
        return jnp.moveaxis(out, 0, 1).reshape(N, H, W)

    D = max_dy
    img_pad = jnp.pad(img, ((0, 0), (D, D + 1), (0, 0)))

    def body(acc, dy):
        im_dy = lax.dynamic_slice(img_pad, (0, dy, 0), (N, H, W))
        # im_dy row r = img row r + (dy - D)
        shift = dy - D
        wy0 = (y0i == rows + shift).astype(jnp.float32) * (1 - fy)
        wy1 = (y0i == rows + shift - 1).astype(jnp.float32) * fy
        wy = wy0 + wy1
        sampled = xsample(im_dy)
        return acc + wy * sampled, None

    acc, _ = lax.scan(body, jnp.zeros_like(img),
                      jnp.arange(2 * D + 2, dtype=jnp.int32))
    return acc


def warp2d_ref(img, flow):
    from depthinspace_tpu.ops import warp
    return warp(img[..., None], flow)[..., 0]


w_ref = bench("2Dwarp flat ref fwd", jax.jit(warp2d_ref), img, flow)
w_new = bench("2Dwarp scan-dy fwd", jax.jit(partial(warp2d_scan, max_dy=16)),
              img, flow)
print("  scan-dy vs flat max err:",
      float(jnp.abs(w_ref - w_new).max()), flush=True)

bench("2Dwarp scan-dy grad wrt img", jax.jit(jax.grad(
    lambda im_: jnp.sum(jnp.sin(warp2d_scan(im_, flow))))), img)
bench("2Dwarp scan-dy grad wrt flow", jax.jit(jax.grad(
    lambda fl: jnp.sum(jnp.sin(warp2d_scan(img, fl))))), flow)
