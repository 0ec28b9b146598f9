"""Local Contrast Normalization (LCN).

Functional equivalent of the reference ``LCN`` module (reference
model/networks.py:663-689): an all-ones (2r+1)^2 box filter with reflection
padding computes per-pixel mean/std; output is (x - mean) / (std + eps).

TPU-first design: instead of a dense (2r+1)^2 convolution we use two
separable 1D window sums via ``lax.reduce_window`` — O(2r) instead of
O((2r)^2) work per pixel, and reduce_window lowers to efficient fused VPU
code on TPU.  LCN runs *inside* the jitted train step (the reference ran it
eagerly per batch on GPU, reference model/worker.py:430-445).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("radius",))
def box_sum(x: jax.Array, radius: int) -> jax.Array:
    """Sum over a (2r+1)x(2r+1) window with reflection padding.

    x: (..., H, W). Reflection excludes the border pixel (numpy 'reflect'),
    matching torch.nn.ReflectionPad2d.
    """
    r = radius
    pad = [(0, 0)] * (x.ndim - 2) + [(r, r), (r, r)]
    xp = jnp.pad(x, pad, mode="reflect")
    k = 2 * r + 1
    window = (1,) * (x.ndim - 2) + (k, 1)
    xp = lax.reduce_window(xp, jnp.array(0, x.dtype), lax.add,
                           window_dimensions=window,
                           window_strides=(1,) * x.ndim,
                           padding="VALID")
    window = (1,) * (x.ndim - 2) + (1, k)
    return lax.reduce_window(xp, jnp.array(0, x.dtype), lax.add,
                             window_dimensions=window,
                             window_strides=(1,) * x.ndim,
                             padding="VALID")


@partial(jax.jit, static_argnames=("radius", "epsilon"))
def lcn(x: jax.Array, radius: int = 5, epsilon: float = 0.05):
    """Local contrast normalization.

    Args:
      x: (..., H, W) image(s).
      radius: window radius r; window is (2r+1)^2.
      epsilon: added to the std before division.

    Returns:
      (normalized, std) with the same shape as x, where
      normalized = (x - mean) / (std + epsilon) and std includes the +epsilon
      shift — exactly the reference's return contract
      (model/networks.py:679-689).
    """
    n = float((2 * radius + 1) ** 2)
    boxs = box_sum(x, radius)
    avgs = boxs / n
    boxs_2n = box_sum(x * x, radius)
    stds = jnp.sqrt(jnp.clip(boxs_2n / n - avgs * avgs + 1e-6, min=0.0))
    stds = stds + epsilon
    return (x - avgs) / stds, stds
