"""Multi-view flow-consistency (geometric) losses.

Redesigns of the reference ``Single_Frame_Flow_Consistency_Loss`` (reference
model/networks.py:609-661) and ``Multi_Frame_Flow_Consistency_Loss``
(model/networks.py:554-607) as pure functions over NHW(-C) arrays.

For an ordered view pair (0 -> 1):
  - unproject view-0 depth with pose 0, project into view 1 -> (uv1, d1);
  - sample view-1's depth map at the *optical-flow*-displaced coordinates
    (zeros padding) -> depth10;
  - diff = |d1 - depth10| (clamped to [0, clamp] in the single-frame
    variant only — the multi-frame variant takes clamp but never applies it,
    reference model/networks.py:580);
  - masks (all under stop_gradient):
      fb_mask: forward-backward flow check
               ||f01 + f10∘w||^2 < 0.5 + 0.02 (||f01||^2 + ||f10∘w||^2)
      vc_mask: visibility/ambient consistency |amb0 - amb1∘w| < 0.01
      rf_mask (multi-frame only): reproject the *primary* depth of view 1
               into view 0 and require the flow-warped round-trip pixel error
               to be < 1 px (reference model/networks.py:591-595);
  - loss = sum(diff * mask) / (sum(mask) + 1e-8), symmetrized over 0<->1.

The track's C(tl,2) view pairs are evaluated with ``vmap`` over pair-index
arrays (see ``pairwise_indices``) instead of the reference's Python loop —
one fused XLA computation for all pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.sampling import bilinear_sample
from ..ops.resample import flow_warp
from ..ops.geometry import pixel_rays, reproject


class CameraGeometry(NamedTuple):
    """Per-scale camera model: intrinsics + per-pixel rays + pixel grid.

    Array-leaf-only pytree so it can be passed as a jit *argument* — on this
    TPU stack, gathers whose operands are closed-over constants fall into a
    pathologically slow XLA lowering (~2000x), so every array constant is
    threaded through the jitted step as an argument (see train/steps.py).
    Image dims come from grid.shape (static under jit)."""
    K: jax.Array          # (3, 3)
    ray: jax.Array        # (H*W, 3)
    grid: jax.Array       # (H, W, 2) pixel coordinates (u, v)

    @property
    def height(self) -> int:
        return self.grid.shape[0]

    @property
    def width(self) -> int:
        return self.grid.shape[1]

    @staticmethod
    def create(K: np.ndarray, height: int, width: int) -> "CameraGeometry":
        Ki = np.linalg.inv(K)
        ray = pixel_rays(Ki, height, width)
        u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                           np.arange(height, dtype=np.float32))
        grid = np.stack([u, v], axis=-1)
        return CameraGeometry(jnp.asarray(K.astype(np.float32)),
                              jnp.asarray(ray), jnp.asarray(grid))


def _flow_coords(cam: CameraGeometry, flow: jax.Array):
    """Target sample coordinates = identity grid + flow. flow: (N,H,W,2)."""
    x = flow[..., 0] + cam.grid[None, ..., 0]
    y = flow[..., 1] + cam.grid[None, ..., 1]
    return x, y


def flow_consistency_sf(cam: CameraGeometry,
                        depth0, depth1, R0, t0, R1, t1,
                        flow0, flow1, amb0, amb1,
                        clamp: float = 0.1,
                        max_shift: int = 16) -> jax.Array:
    """Symmetrized single-frame flow-consistency loss for one view pair.

    depth/amb: (N, H, W); flow: (N, H, W, 2); R: (N,3,3); t: (N,3).

    TPU note: all per-pixel samples of view-1 quantities (depth, backward
    flow, ambient) happen at the same flow-displaced coordinates, so they
    are packed channel-wise into ONE bilinear gather instead of three —
    2D gathers are the dominant cost of this loss on TPU.
    """
    def one_way(d0, d1_, Ra, ta, Rb, tb, f0, f1, a0, a1):
        N = d0.shape[0]
        _, d1 = reproject(d0, cam.ray, cam.K, Ra, ta, Rb, tb)
        d1 = d1.reshape(N, cam.height, cam.width)

        stack = jnp.concatenate([
            d1_[..., None],
            jax.lax.stop_gradient(f1),
            jax.lax.stop_gradient(a1)[..., None],
        ], axis=-1)                                     # (N, H, W, 4)
        sampled = flow_warp(stack, f0, max_shift=max_shift)
        depth10 = sampled[..., 0]
        flow10 = jax.lax.stop_gradient(sampled[..., 1:3])
        amb10 = jax.lax.stop_gradient(sampled[..., 3])

        diff = jnp.abs(d1 - depth10)
        if clamp > 0:
            diff = jnp.clip(diff, 0.0, clamp)

        f0_s = jax.lax.stop_gradient(f0)
        fb = (jnp.sum((f0_s + flow10) ** 2, axis=-1)
              < 0.5 + 0.02 * (jnp.sum(f0_s ** 2, axis=-1)
                              + jnp.sum(flow10 ** 2, axis=-1)))
        vc = jnp.abs(jax.lax.stop_gradient(a0) - amb10) < 0.01
        mask = jax.lax.stop_gradient(
            fb.astype(jnp.float32) * vc.astype(jnp.float32))
        return jnp.sum(diff * mask) / (jnp.sum(mask) + 1e-8)

    l0 = one_way(depth0, depth1, R0, t0, R1, t1, flow0, flow1, amb0, amb1)
    l1 = one_way(depth1, depth0, R1, t1, R0, t0, flow1, flow0, amb1, amb0)
    return l0 + l1


def flow_consistency_mf(cam: CameraGeometry,
                        depth0, depth1, R0, t0, R1, t1,
                        flow0, flow1, amb0, amb1,
                        primary_depth0, primary_depth1,
                        max_shift: int = 16) -> jax.Array:
    """Symmetrized multi-frame flow-consistency loss for one view pair,
    with the extra primary-depth round-trip mask (rf_mask). Samples are
    channel-packed into one gather like the single-frame variant."""
    def one_way(d0, d1_, Ra, ta, Rb, tb, f0, f1, a0, a1, pd1):
        N = d0.shape[0]
        _, d1 = reproject(d0, cam.ray, cam.K, Ra, ta, Rb, tb)
        d1 = d1.reshape(N, cam.height, cam.width)

        # rf_mask source field: project view-1's primary depth into view 0
        uv0, _ = reproject(jax.lax.stop_gradient(pd1), cam.ray, cam.K,
                           jax.lax.stop_gradient(Rb), jax.lax.stop_gradient(tb),
                           jax.lax.stop_gradient(Ra), jax.lax.stop_gradient(ta))
        uv0 = uv0.reshape(N, cam.height, cam.width, 2)

        stack = jnp.concatenate([
            d1_[..., None],
            jax.lax.stop_gradient(f1),
            jax.lax.stop_gradient(a1)[..., None],
            uv0,
        ], axis=-1)                                     # (N, H, W, 6)
        sampled = flow_warp(stack, f0, max_shift=max_shift)
        depth10 = sampled[..., 0]
        flow10 = jax.lax.stop_gradient(sampled[..., 1:3])
        amb10 = jax.lax.stop_gradient(sampled[..., 3])
        warped_uv0 = jax.lax.stop_gradient(sampled[..., 4:6])

        diff = jnp.abs(d1 - depth10)

        f0_s = jax.lax.stop_gradient(f0)
        fb = (jnp.sum((f0_s + flow10) ** 2, axis=-1)
              < 0.5 + 0.02 * (jnp.sum(f0_s ** 2, axis=-1)
                              + jnp.sum(flow10 ** 2, axis=-1)))
        vc = jnp.abs(jax.lax.stop_gradient(a0) - amb10) < 0.01
        rf = jnp.sum((warped_uv0 - cam.grid[None]) ** 2, axis=-1) < 1.0
        mask = jax.lax.stop_gradient(
            fb.astype(jnp.float32) * vc.astype(jnp.float32)
            * rf.astype(jnp.float32))
        return jnp.sum(diff * mask) / (jnp.sum(mask) + 1e-8)

    l0 = one_way(depth0, depth1, R0, t0, R1, t1, flow0, flow1, amb0, amb1,
                 primary_depth1)
    l1 = one_way(depth1, depth0, R1, t1, R0, t0, flow1, flow0, amb1, amb0,
                 primary_depth0)
    return l0 + l1


def pairwise_indices(track_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Index arrays (i, j) for all C(tl, 2) unordered view pairs, matching the
    reference's nested loop order (single_frame_worker.py:135-149)."""
    ii, jj = [], []
    for i in range(track_length):
        for j in range(i + 1, track_length):
            ii.append(i)
            jj.append(j)
    return np.asarray(ii, np.int32), np.asarray(jj, np.int32)


def geometric_loss_sf(cam: CameraGeometry, depth, R, t, flow, amb,
                      clamp: float = 0.1, max_shift: int = 16) -> jax.Array:
    """Sum of the SF pair losses over all C(tl,2) pairs.

    depth/amb: (tl, N, H, W); R: (tl, N, 3, 3); t: (tl, N, 3);
    flow: (tl, tl, N, H, W, 2) with flow[i, j] = flow from frame i to j.
    Returns the *sum* over pairs (caller applies 0.2/ge_num weighting,
    reference single_frame_worker.py:149).

    The pair loop is a static Python unroll: measured 2x faster than vmap
    over pair-index arrays on v5e (the vmapped form batches the 2D gathers
    into an even slower lowering).
    """
    total = 0.0
    for i, j in zip(*pairwise_indices(depth.shape[0])):
        total += flow_consistency_sf(
            cam, depth[i], depth[j], R[i], t[i], R[j], t[j],
            flow[i, j], flow[j, i], amb[i], amb[j], clamp=clamp,
            max_shift=max_shift)
    return total


def geometric_loss_mf(cam: CameraGeometry, depth, R, t, flow, amb,
                      primary_depth, max_shift: int = 16) -> jax.Array:
    """Sum of the MF pair losses over all C(tl,2) pairs (static unroll)."""
    total = 0.0
    for i, j in zip(*pairwise_indices(depth.shape[0])):
        total += flow_consistency_mf(
            cam, depth[i], depth[j], R[i], t[i], R[j], t[j],
            flow[i, j], flow[j, i], amb[i], amb[j],
            primary_depth[i], primary_depth[j], max_shift=max_shift)
    return total
