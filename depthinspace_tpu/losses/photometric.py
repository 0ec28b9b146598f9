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

from ..ops.census import census_sad


def _row_gather(img: jax.Array, idx: jax.Array) -> jax.Array:
    """img (N,H,W), idx int32 (N,H,W) -> img[n,h,idx]; row-aligned gather
    (the fast TPU path: every output row reads its own input row)."""
    return jnp.take_along_axis(img, idx, axis=-1)


@jax.custom_vjp
def _xwarp_border(pattern: jax.Array, disp: jax.Array) -> jax.Array:
    """pattern (N,H,W) sampled at u' = u - disp with border clamp.

    Custom VJP rationale (measured on v5e at 32x512x432): the forward
    row-aligned gather runs in ~0.1 ms, but autodiff's transpose emitted a
    ~300 ms scatter/gather graph. The pattern is a constant (the projector
    reference), so its gradient is not needed at all; the disparity gradient
    is just -(P(x0+1) - P(x0)) * (1 - clamp-mask), two more row-aligned
    gathers. This keeps the whole photometric loss scatter-free.
    """
    out, _ = _xwarp_fwd_impl(pattern, disp)
    return out


def _xwarp_fwd_impl(pattern, disp):
    N, H, W = disp.shape
    u = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    x = u - disp
    xc = jnp.clip(x, 0.0, W - 1.0)
    x0 = jnp.floor(xc)
    f = xc - x0
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, W - 1)
    v0 = _row_gather(pattern, i0)
    v1 = _row_gather(pattern, i1)
    out = v0 * (1.0 - f) + v1 * f
    inside = ((x > 0.0) & (x < W - 1.0)).astype(disp.dtype)
    return out, (v1 - v0, inside)


def _xwarp_fwd(pattern, disp):
    out, _ = _xwarp_fwd_impl(pattern, disp)
    # Save only the inputs and RECOMPUTE the corner gathers in the backward:
    # keeping (v1 - v0) as a residual dragged the forward gather into XLA's
    # slow flat dynamic-gather form (~180 ms vs ~0.1 ms on v5e).
    return out, (pattern, disp)


def _xwarp_bwd(res, g):
    pattern, disp = res
    _, (dv, inside) = _xwarp_fwd_impl(pattern, disp)
    # d out / d disp = d out / d x * dx/d disp = (v1 - v0) * (-1), zeroed
    # where the border clamp is active (torch grid_sample semantics).
    grad_disp = -dv * inside * g
    return None, grad_disp


_xwarp_border.defvjp(_xwarp_fwd, _xwarp_bwd)


def warp_pattern_by_disparity(pattern: jax.Array, disp: jax.Array,
                              max_disp: int = 128) -> jax.Array:
    """Sample the (rectified) pattern at u' = u - disp.

    pattern: (H, W) or (N, H, W) — treated as a constant (no gradient);
    disp: (N, H, W). Returns (N, H, W). Dispatches to the Pallas warp
    kernel on TPU (ops/resample.py)."""
    from ..ops.resample import warp_pattern
    return warp_pattern(pattern, disp, max_disp)


def _census_auto(es, ta, block_size, eps):
    from ..ops.pallas.census_kernel import census_sad_auto
    return census_sad_auto(es, ta, block_size, eps)


def photometric_loss(disp: jax.Array, im: jax.Array, pattern: jax.Array,
                     std: jax.Array | None = None,
                     block_size: int = 9, eps: float = 0.5,
                     census_fn: Callable = _census_auto,
                     output_mean: bool = True, max_disp: int = 128):
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
    pattern_proj = warp_pattern_by_disparity(pattern, disp, max_disp)
    diff = census_fn(pattern_proj, im, block_size, eps)
    if std is not None:
        mask = std
        val = jnp.sum(mask * diff) / jnp.sum(mask)
    else:
        val = jnp.mean(diff)
    if output_mean:
        return val, pattern_proj
    return diff, pattern_proj
