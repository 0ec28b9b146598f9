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

        # gradient-carrying sample (depth only) and no-grad samples are
        # separate kernel calls so the adjoint enumeration runs for one
        # channel instead of four
        depth10 = flow_warp(d1_[..., None], f0, max_shift=max_shift)[..., 0]
        stack = jax.lax.stop_gradient(jnp.concatenate([
            f1, a1[..., None]], axis=-1))               # (N, H, W, 3)
        sampled = jax.lax.stop_gradient(
            flow_warp(stack, f0, max_shift=max_shift))
        flow10 = sampled[..., 0:2]
        amb10 = sampled[..., 2]

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

        depth10 = flow_warp(d1_[..., None], f0, max_shift=max_shift)[..., 0]
        stack = jax.lax.stop_gradient(jnp.concatenate([
            f1, a1[..., None], uv0], axis=-1))          # (N, H, W, 5)
        sampled = jax.lax.stop_gradient(
            flow_warp(stack, f0, max_shift=max_shift))
        flow10 = sampled[..., 0:2]
        amb10 = sampled[..., 2]
        warped_uv0 = sampled[..., 3:5]

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


def _ordered_directions(track_length: int):
    """All 2*C(tl,2) ordered (a, b) view directions (a -> b), both ways per
    unordered pair, in the reference's summation order."""
    dirs = []
    for i, j in zip(*pairwise_indices(track_length)):
        dirs.append((int(i), int(j)))
        dirs.append((int(j), int(i)))
    return dirs


def geometric_loss_sf(cam: CameraGeometry, depth, R, t, flow, amb,
                      clamp: float = 0.1, max_shift: int = 16,
                      with_stats: bool = False):
    """Sum of the SF pair losses over all C(tl,2) pairs.

    depth/amb: (tl, N, H, W); R: (tl, N, 3, 3); t: (tl, N, 3);
    flow: (tl, tl, N, H, W, 2) with flow[i, j] = flow from frame i to j.
    Returns the *sum* over pairs (caller applies 0.2/ge_num weighting,
    reference single_frame_worker.py:149).

    TPU batching: all 2*C(tl,2) ordered directions are stacked and sent
    through ONE Pallas warp per gradient class (grad-carrying depth sample,
    no-grad mask samples) — the warp kernels dominate this loss and batching
    amortizes their band-grid pipeline across directions.
    """
    dirs = _ordered_directions(depth.shape[0])
    nd = len(dirs)
    N = depth.shape[1]
    Hh, Ww = cam.height, cam.width

    def gather_dir(x, idx):
        return jnp.concatenate([x[i] for i in idx], axis=0)

    a_idx = [a for a, b in dirs]
    b_idx = [b for a, b in dirs]
    d0 = gather_dir(depth, a_idx)                 # (nd*N, H, W)
    d1_ = gather_dir(depth, b_idx)
    Ra = gather_dir(R, a_idx)
    ta = gather_dir(t, a_idx)
    Rb = gather_dir(R, b_idx)
    tb = gather_dir(t, b_idx)
    f0 = jnp.concatenate([flow[a, b] for a, b in dirs], axis=0)
    f1 = jnp.concatenate([flow[b, a] for a, b in dirs], axis=0)
    a0 = gather_dir(amb, a_idx)
    a1 = gather_dir(amb, b_idx)

    _, d1 = reproject(d0, cam.ray, cam.K, Ra, ta, Rb, tb)
    d1 = d1.reshape(nd * N, Hh, Ww)

    depth10 = flow_warp(d1_[..., None], f0, max_shift=max_shift)[..., 0]
    stack = jax.lax.stop_gradient(
        jnp.concatenate([f1, a1[..., None]], axis=-1))
    sampled = jax.lax.stop_gradient(flow_warp(stack, f0,
                                              max_shift=max_shift))
    flow10 = sampled[..., 0:2]
    amb10 = sampled[..., 2]

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

    # per-direction masked means (the reference normalizes per direction)
    diff = (diff * mask).reshape(nd, -1).sum(axis=1)
    msum = mask.reshape(nd, -1).sum(axis=1)
    loss = jnp.sum(diff / (msum + 1e-8))
    if with_stats:
        # per-mask accept fractions — diagnosing whether a flow provider's
        # error level starves the loss (fb threshold is ~0.7 px at zero
        # motion, so a high-EPE provider zeroes the gradient silently)
        stats = {"fb": jnp.mean(fb), "vc": jnp.mean(vc),
                 "accept": jnp.mean(mask)}
        return loss, stats
    return loss


def geometric_loss_mf(cam: CameraGeometry, depth, R, t, flow, amb,
                      primary_depth, max_shift: int = 16,
                      with_stats: bool = False):
    """Sum of the MF pair losses over all C(tl,2) pairs, direction-batched
    like geometric_loss_sf, with the extra primary-depth rf_mask."""
    dirs = _ordered_directions(depth.shape[0])
    nd = len(dirs)
    N = depth.shape[1]
    Hh, Ww = cam.height, cam.width

    def gather_dir(x, idx):
        return jnp.concatenate([x[i] for i in idx], axis=0)

    a_idx = [a for a, b in dirs]
    b_idx = [b for a, b in dirs]
    d0 = gather_dir(depth, a_idx)
    d1_ = gather_dir(depth, b_idx)
    Ra = gather_dir(R, a_idx)
    ta = gather_dir(t, a_idx)
    Rb = gather_dir(R, b_idx)
    tb = gather_dir(t, b_idx)
    f0 = jnp.concatenate([flow[a, b] for a, b in dirs], axis=0)
    f1 = jnp.concatenate([flow[b, a] for a, b in dirs], axis=0)
    a0 = gather_dir(amb, a_idx)
    a1 = gather_dir(amb, b_idx)
    pd1 = jax.lax.stop_gradient(gather_dir(primary_depth, b_idx))

    _, d1 = reproject(d0, cam.ray, cam.K, Ra, ta, Rb, tb)
    d1 = d1.reshape(nd * N, Hh, Ww)

    uv0, _ = reproject(pd1, cam.ray, cam.K,
                       jax.lax.stop_gradient(Rb), jax.lax.stop_gradient(tb),
                       jax.lax.stop_gradient(Ra), jax.lax.stop_gradient(ta))
    uv0 = uv0.reshape(nd * N, Hh, Ww, 2)

    depth10 = flow_warp(d1_[..., None], f0, max_shift=max_shift)[..., 0]
    stack = jax.lax.stop_gradient(
        jnp.concatenate([f1, a1[..., None], uv0], axis=-1))
    sampled = jax.lax.stop_gradient(flow_warp(stack, f0,
                                              max_shift=max_shift))
    flow10 = sampled[..., 0:2]
    amb10 = sampled[..., 2]
    warped_uv0 = sampled[..., 3:5]

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

    diff = (diff * mask).reshape(nd, -1).sum(axis=1)
    msum = mask.reshape(nd, -1).sum(axis=1)
    loss = jnp.sum(diff / (msum + 1e-8))
    if with_stats:
        stats = {"fb": jnp.mean(fb), "vc": jnp.mean(vc), "rf": jnp.mean(rf),
                 "accept": jnp.mean(mask)}
        return loss, stats
    return loss
