"""Additional losses present in the reference but not on the default path.

API-parity ports (defined-but-dormant in the reference, kept for users who
enable them):
- SSIM (reference model/networks.py:379-409)
- ProjectionDepthSimilarityLoss with forward-backward rigid-flow occlusion
  masks (reference model/networks.py:496-551)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.sampling import bilinear_sample
from ..ops.geometry import reproject
from .geometric import CameraGeometry


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """SSIM dissimilarity map, clamp((1 - SSIM)/2, 0, 1).

    x, y: (N, H, W, C); 3x3 average pooling with reflection padding, C1/C2
    constants 0.01^2 / 0.03^2 (reference model/networks.py:379-409)."""
    def pool(a):
        ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        s = lax.reduce_window(ap, jnp.array(0, a.dtype), lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
        return s / 9.0

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x * x) - mu_x ** 2
    sigma_y = pool(y * y) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def _rigid_flow_and_diff(cam: CameraGeometry, depth0, depth1,
                         R0, t0, R1, t1, clamp):
    """One direction of the projection-depth-similarity loss: project
    view-0 depth into view 1, compare against sampled view-1 depth at the
    *rigid-flow* coordinates (border padding; reference
    model/networks.py:505-530)."""
    N = depth0.shape[0]
    H, W = cam.height, cam.width
    uv1, d1 = reproject(depth0, cam.ray, cam.K, R0, t0, R1, t1)
    uv1 = uv1.reshape(N, H, W, 2)
    d1 = d1.reshape(N, H, W)
    rigid_flow = uv1 - cam.grid[None]
    depth10 = bilinear_sample(depth1[..., None], uv1[..., 0], uv1[..., 1],
                              padding="border")[..., 0]
    diff = jnp.abs(d1 - depth10)
    if clamp > 0:
        diff = jnp.clip(diff, 0.0, clamp)
    return jnp.mean(diff), rigid_flow


def occlusion_mask(cam: CameraGeometry, flow0, flow1) -> jax.Array:
    """Forward-backward rigid-flow consistency mask (reference
    generate_mask, model/networks.py:542-551): ||f0 + f1∘w||^2 < 0.25 +
    0.02 (||f0||^2 + ||f1∘w||^2)."""
    x = flow0[..., 0] + cam.grid[None, ..., 0]
    y = flow0[..., 1] + cam.grid[None, ..., 1]
    flow0_proj = bilinear_sample(flow1, x, y, padding="border")
    lhs = jnp.sum((flow0 + flow0_proj) ** 2, axis=-1)
    rhs = 0.25 + 0.02 * (jnp.sum(flow0 ** 2, axis=-1)
                         + jnp.sum(flow0_proj ** 2, axis=-1))
    return (lhs < rhs).astype(jnp.float32)[..., None]


def projection_depth_similarity_loss(cam: CameraGeometry, depth0, depth1,
                                     R0, t0, R1, t1, clamp: float = -1.0):
    """Symmetrized geometric loss over *rigid* (pose-induced) flow, with
    occlusion masks (reference ProjectionDepthSimilarityLoss,
    model/networks.py:496-541).

    Returns (loss, rigid_flow0, rigid_flow1, mask0, mask1)."""
    l0, rf0 = _rigid_flow_and_diff(cam, depth0, depth1, R0, t0, R1, t1, clamp)
    l1, rf1 = _rigid_flow_and_diff(cam, depth1, depth0, R1, t1, R0, t0, clamp)
    rf0_s = jax.lax.stop_gradient(rf0)
    rf1_s = jax.lax.stop_gradient(rf1)
    mask0 = occlusion_mask(cam, rf0_s, rf1_s)
    mask1 = occlusion_mask(cam, rf1_s, rf0_s)
    return l0 + l1, rf0, rf1, mask0, mask1
