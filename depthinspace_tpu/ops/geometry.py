"""Camera projection geometry: rays, unproject/project, disparity<->depth.

Functional equivalents of the reference ``ProjectionBaseLoss`` machinery
(reference model/networks.py:433-493) and ``DispToDepth``
(model/networks.py:311-319), as pure jnp functions over batched point sets.

Conventions copied from the reference:
  unproject: xyz_cam = depth * ray;  xyz_world = (xyz_cam - t) @ R
  project:   xyz_cam = xyz_world @ R^T + t;  uvd = xyz_cam @ K^T;
             uv = uvd[..., :2] / (relu(uvd[..., 2]) + 1e-12)

All matmuls are einsum'd so XLA batches them onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pixel_rays(K_inv: np.ndarray, height: int, width: int) -> np.ndarray:
    """Per-pixel unit-depth rays: uv1 @ K^-T, shape (H*W, 3), row-major
    (v major, u minor) — matches reference model/networks.py:445-451."""
    u, v = np.meshgrid(range(width), range(height))
    uv = np.stack((u, v, np.ones_like(u)), axis=2).reshape(-1, 3)
    ray = uv @ K_inv.T
    return ray.astype(np.float32)


def unproject(depth: jax.Array, ray: jax.Array,
              R: jax.Array | None = None,
              t: jax.Array | None = None) -> jax.Array:
    """depth (N, H*W) or (N, H, W) + ray (H*W, 3) -> world xyz (N, H*W, 3)."""
    N = depth.shape[0]
    xyz = depth.reshape(N, -1, 1) * ray[None]
    if t is not None:
        xyz = xyz - t.reshape(N, 1, 3)
    if R is not None:
        xyz = jnp.einsum("npi,nij->npj", xyz, R)
    return xyz


def project(xyz: jax.Array, K: jax.Array, R: jax.Array, t: jax.Array):
    """World xyz (N, P, 3) -> pixel uv (N, P, 2) and depth d (N, P, 1)."""
    N = xyz.shape[0]
    xyz = jnp.einsum("npj,nij->npi", xyz, R)       # xyz @ R^T
    xyz = xyz + t.reshape(N, 1, 3)
    uvd = jnp.einsum("npj,ij->npi", xyz, K)        # xyz @ K^T
    d = uvd[:, :, 2:3]
    uv = uvd[:, :, :2] / (jax.nn.relu(d) + 1e-12)
    return uv, d


def reproject(depth0: jax.Array, ray: jax.Array, K: jax.Array,
              R0: jax.Array, t0: jax.Array, R1: jax.Array, t1: jax.Array):
    """Unproject view-0 depth to world, project into view 1
    (reference ProjectionBaseLoss.tforward, model/networks.py:491-493)."""
    xyz = unproject(depth0, ray, R0, t0)
    return project(xyz, K, R1, t1)


def disp_to_depth(disp: jax.Array, focal_length: float, baseline: float) -> jax.Array:
    """depth = baseline * f / (relu(disp) + 1e-12)
    (reference model/networks.py:311-319)."""
    return (baseline * focal_length) / (jax.nn.relu(disp) + 1e-12)


def depth_to_disp(depth: jax.Array, focal_length: float, baseline: float) -> jax.Array:
    return (baseline * focal_length) / jnp.maximum(depth, 1e-12)
