"""Stereo-matching utility ops (API parity with the reference's torchext
wrappers, model/ext_functions.py:41-110: nn, crosscheck, proj_nn, xcorrvol).

The reference wraps these Connecting-the-Dots CUDA ops but never calls them
on any pipeline path (verified by grep, SURVEY.md §2.2); they are provided
here as jnp implementations for users of the original API. Like the
reference wrappers, they are non-differentiable (wrapped in stop_gradient).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def nn_search(in0: jax.Array, in1: jax.Array) -> jax.Array:
    """For each point in in0 (N, P0, C), the index of its nearest neighbor
    in in1 (N, P1, C) under squared L2. Returns int32 (N, P0)."""
    d = (jnp.sum(in0 ** 2, -1)[:, :, None]
         - 2 * jnp.einsum("npc,nqc->npq", in0, in1)
         + jnp.sum(in1 ** 2, -1)[:, None, :])
    return jax.lax.stop_gradient(jnp.argmin(d, axis=-1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("threshold",))
def crosscheck(disp0: jax.Array, disp1: jax.Array,
               threshold: float = 1.0) -> jax.Array:
    """Left-right disparity consistency mask.

    disp0/disp1: (N, H, W) disparities of the left/right rectified views.
    A left pixel u survives if |disp0(u) - disp1(u - disp0(u))| < threshold.
    Returns float32 (N, H, W) in {0, 1}."""
    N, H, W = disp0.shape
    u = jnp.arange(W, dtype=disp0.dtype)[None, None, :]
    x = jnp.clip(u - disp0, 0.0, W - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    f = x - x0
    v0 = jnp.take_along_axis(disp1, x0, axis=-1)
    v1 = jnp.take_along_axis(disp1, x1, axis=-1)
    d1 = v0 * (1 - f) + v1 * f
    ok = jnp.abs(disp0 - d1) < threshold
    return jax.lax.stop_gradient(ok.astype(jnp.float32))


@partial(jax.jit, static_argnames=("patch_size",))
def proj_nn(xyz0: jax.Array, xyz1: jax.Array, K: jax.Array,
            patch_size: int = 3) -> jax.Array:
    """Projective nearest neighbor: for every pixel's 3D point in xyz0
    (N, H, W, 3), the nearest 3D point of xyz1 within the patch_size^2
    neighborhood of the same pixel. Returns (N, H, W, 3)."""
    p = patch_size // 2
    N, H, W, _ = xyz0.shape
    xp = jnp.pad(xyz1, ((0, 0), (p, p), (p, p), (0, 0)),
                 constant_values=jnp.inf)
    cands = jnp.stack([xp[:, dy:dy + H, dx:dx + W, :]
                       for dy in range(patch_size)
                       for dx in range(patch_size)], axis=-2)  # (N,H,W,k2,3)
    d = jnp.sum((cands - xyz0[..., None, :]) ** 2, axis=-1)
    d = jnp.where(jnp.isfinite(d), d, jnp.inf)
    idx = jnp.argmin(d, axis=-1)
    out = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    return jax.lax.stop_gradient(jnp.where(jnp.isfinite(out), out, 0.0))


@partial(jax.jit, static_argnames=("n_disps", "block_size"))
def xcorrvol(in0: jax.Array, in1: jax.Array, n_disps: int = 64,
             block_size: int = 9) -> jax.Array:
    """Zero-normalized cross-correlation cost volume over disparities.

    in0/in1: (N, H, W) rectified left/right images. Returns (N, H, W,
    n_disps): the block-wise correlation of in0 at u with in1 at u - d."""
    p = block_size // 2
    n = float(block_size ** 2)

    def box(x):
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="edge")
        s = lax.reduce_window(xp, jnp.array(0, x.dtype), lax.add,
                              (1, block_size, 1), (1, 1, 1), "VALID")
        return lax.reduce_window(s, jnp.array(0, x.dtype), lax.add,
                                 (1, 1, block_size), (1, 1, 1), "VALID")

    mu0 = box(in0) / n
    var0 = box(in0 * in0) / n - mu0 ** 2

    N, H, W = in0.shape
    in1_pad = jnp.pad(in1, ((0, 0), (0, 0), (n_disps, 0)), mode="edge")

    def corr(carry, d):
        sh = lax.dynamic_slice(in1_pad, (0, 0, n_disps - d), (N, H, W))
        mu1 = box(sh) / n
        var1 = box(sh * sh) / n - mu1 ** 2
        cov = box(in0 * sh) / n - mu0 * mu1
        c = cov * lax.rsqrt(jnp.maximum(var0 * var1, 1e-12))
        return carry, c

    _, vol = lax.scan(corr, None, jnp.arange(n_disps, dtype=jnp.int32))
    return jax.lax.stop_gradient(jnp.moveaxis(vol, 0, -1))
