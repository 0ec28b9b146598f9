"""Edge-aware disparity smoothness loss.

Functional equivalent of the reference ``DisparitySmoothLoss``
(reference model/networks.py:411-431): mean over |∇disp| * exp(-|255 * ∇amb|)
with 5x5 Sobel gradients (replicate padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sobel import sobel


def smoothness_loss(disp: jax.Array, ambient: jax.Array) -> jax.Array:
    """disp, ambient: (N, H, W). Returns scalar."""
    g_d = sobel(disp[..., None], ksize=5)        # (N, H, W, 2)
    g_a = sobel(ambient[..., None], ksize=5)
    val = jnp.abs(g_d * jnp.exp(-jnp.abs(255.0 * g_a)))
    return jnp.mean(val)
