"""Photometric (pattern-similarity) loss.

Functional redesign of the reference ``RectifiedPatternSimilarityLoss``
(reference model/networks.py:336-377): the projector pattern is warped to the
camera view by shifting each pixel's u coordinate by the predicted disparity
(rectified setup — v is unchanged), then compared to the IR image with the
census-SAD dissimilarity, weighted by the LCN std map.

The warp is done directly in pixel space (u - disp) with border-clamped
bilinear sampling — identical to the reference's normalize->grid_sample
round-trip with align_corners=True.  Gradients flow into the disparity
through the sample coordinates and through the census custom VJP.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.sampling import bilinear_sample
from ..ops.census import census_sad


def warp_pattern_by_disparity(pattern: jax.Array, disp: jax.Array) -> jax.Array:
    """Sample the (rectified) pattern at u' = u - disp.

    pattern: (H, W) or (N, H, W); disp: (N, H, W). Returns (N, H, W).
    """
    N, H, W = disp.shape
    if pattern.ndim == 2:
        pattern = jnp.broadcast_to(pattern[None], (N, H, W))
    u = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    v = jnp.broadcast_to(jnp.arange(H, dtype=disp.dtype)[None, :, None], (N, H, W))
    x = u - disp
    out = bilinear_sample(pattern[..., None], x, v, padding="border")
    return out[..., 0]


def photometric_loss(disp: jax.Array, im: jax.Array, pattern: jax.Array,
                     std: jax.Array | None = None,
                     block_size: int = 9, eps: float = 0.5,
                     census_fn: Callable = census_sad,
                     output_mean: bool = True):
    """Census photometric loss between warped pattern and IR image.

    Args:
      disp: (N, H, W) predicted disparity.
      im:   (N, H, W) LCN-normalized IR image.
      pattern: (H, W) LCN-normalized projector pattern.
      std:  optional (N, H, W) LCN std weighting mask
            (reference model/networks.py:368-374).
      census_fn: census implementation (jnp scan path or Pallas kernel).

    Returns:
      (loss_scalar_or_map, pattern_proj); loss = sum(mask*diff)/sum(mask) when
      output_mean, else the raw per-pixel diff map.
    """
    pattern_proj = warp_pattern_by_disparity(pattern, disp)
    diff = census_fn(pattern_proj, im, block_size, eps)
    if std is not None:
        mask = std
        val = jnp.sum(mask * diff) / jnp.sum(mask)
    else:
        val = jnp.mean(diff)
    if output_mean:
        return val, pattern_proj
    return diff, pattern_proj
