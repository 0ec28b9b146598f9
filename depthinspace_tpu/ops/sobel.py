"""Sobel gradient filters (5x5 / 3x3) with replicate padding.

Functional equivalent of the reference ``SobelFilter`` module (reference
model/networks.py:693-731). Used by the edge-aware disparity smoothness loss.
Implemented as one grouped 2-output-channel convolution so XLA maps it onto
the conv units in a single pass.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_KX5 = np.array([[-5, -4, 0, 4, 5],
                 [-8, -10, 0, 10, 8],
                 [-10, -20, 0, 20, 10],
                 [-8, -10, 0, 10, 8],
                 [-5, -4, 0, 4, 5]], dtype=np.float32) / 240.0

_KX3 = np.array([[-1, 0, 1],
                 [-2, 0, 2],
                 [-1, 0, 1]], dtype=np.float32) / 8.0


@partial(jax.jit, static_argnames=("ksize", "norm"))
def sobel(x: jax.Array, ksize: int = 5, norm: bool = False) -> jax.Array:
    """Apply Sobel-x and Sobel-y filters.

    Args:
      x: (N, H, W, 1) single-channel image, NHWC.
      ksize: 5 or 3.
      norm: if True return gradient magnitude (N, H, W, 1); else return the
        two gradients stacked in the channel axis (N, H, W, 2) — channel 0 is
        gx, channel 1 is gy, matching the reference's torch.cat((gx, gy), 1).
    """
    if ksize == 5:
        kx = _KX5
        p = 2
    elif ksize == 3:
        kx = _KX3
        p = 1
    else:
        raise ValueError("ksize must be 3 or 5")
    ky = kx.T

    # HWIO kernel: (kh, kw, in=1, out=2)
    kernel = jnp.asarray(np.stack([kx, ky], axis=-1)[:, :, None, :], dtype=x.dtype)

    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    out = lax.conv_general_dilated(
        xp, kernel,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if norm:
        gx = out[..., 0:1]
        gy = out[..., 1:2]
        return jnp.sqrt(gx * gx + gy * gy + 1e-8)
    return out
