"""DIS-SF single-frame disparity network (DispNetS-style U-Net).

Re-design of the reference ``DispNetS`` / ``DispDecoder``
(reference model/networks.py:170-309) as a Flax module in NHWC layout:

- 7 stride-2 encoder stages (each = stride-2 conv + ReLU + conv + ReLU),
  planes 32,64,128,256,512,512,512 (x channel_multiplier), first kernels 7/5.
- 7 transposed-conv decoder stages with skip-concat "iconv" 3x3 convs.
- 4 disparity heads at scales 1/8..1/1: 3x3 conv + SigmoidAffine
  disp = sigmoid(x - offset) * alpha with alpha = max_disp / 2^s, offset = 3
  (reference model/networks.py:301-309,140-149).
- Scale-s predictions are bilinearly upsampled (align_corners=False — the
  torch default used at reference model/networks.py:273,291-293) and fed to
  the next decoder stage; all four outputs are returned at full resolution.

TPU notes: NHWC + SAME padding (identical output sizes to torch's
p=(k-1)//2 arithmetic for odd kernels), optional bfloat16 compute via the
``compute_dtype`` attribute — params stay f32, heads and outputs are cast
back to f32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sampling import resize_bilinear


class SigmoidAffineHead(nn.Module):
    """3x3 conv -> sigmoid(x/gamma - offset) * alpha + beta."""
    alpha: float
    beta: float = 0.0
    gamma: float = 1.0
    offset: float = 3.0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32)(x)
        return jax.nn.sigmoid(x / self.gamma - self.offset) * self.alpha + self.beta


class _Down(nn.Module):
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        x = nn.Conv(self.features, k, strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype)(x)
        return nn.relu(x)


class _Up(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        return nn.relu(x)


def _crop_like(x, ref):
    return x[:, :ref.shape[1], :ref.shape[2], :]


def _up2(x, ref):
    """Bilinear x2 upsample (align_corners=False), cropped to ref's HW."""
    _, h, w, _ = x.shape
    out = resize_bilinear(x, 2 * h, 2 * w, align_corners=False)
    return _crop_like(out, ref)


class DispNet(nn.Module):
    """Single-frame disparity decoder. Input (N, H, W, 2) = [LCN(IR), IR].

    Returns a tuple of 4 disparity maps, each (N, H, W, 1) at full
    resolution, finest first (reference model/networks.py:290-295).
    """
    max_disp: float = 128.0
    channel_multiplier: int = 1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cm = self.channel_multiplier
        cp: Sequence[int] = [cm * c for c in (32, 64, 128, 256, 512, 512, 512)]
        up: Sequence[int] = [cm * c for c in (512, 512, 256, 128, 64, 32, 16)]
        dt = self.compute_dtype

        x = x.astype(dt)
        c1 = _Down(cp[0], 7, dt)(x)
        c2 = _Down(cp[1], 5, dt)(c1)
        c3 = _Down(cp[2], 3, dt)(c2)
        c4 = _Down(cp[3], 3, dt)(c3)
        c5 = _Down(cp[4], 3, dt)(c4)
        c6 = _Down(cp[5], 3, dt)(c5)
        c7 = _Down(cp[6], 3, dt)(c6)

        def iconv(features, *feats):
            y = jnp.concatenate(feats, axis=-1)
            y = nn.Conv(features, (3, 3), padding="SAME", dtype=dt)(y)
            return nn.relu(y)

        u7 = _crop_like(_Up(up[0], dt)(c7), c6)
        i7 = iconv(up[0], u7, c6)
        u6 = _crop_like(_Up(up[1], dt)(i7), c5)
        i6 = iconv(up[1], u6, c5)
        u5 = _crop_like(_Up(up[2], dt)(i6), c4)
        i5 = iconv(up[2], u5, c4)
        u4 = _crop_like(_Up(up[3], dt)(i5), c3)
        i4 = iconv(up[3], u4, c3)
        disp4 = SigmoidAffineHead(self.max_disp / 8)(i4.astype(jnp.float32))

        u3 = _crop_like(_Up(up[4], dt)(i4), c2)
        d4u = _up2(disp4, c2).astype(dt)
        i3 = iconv(up[4], u3, c2, d4u)
        disp3 = SigmoidAffineHead(self.max_disp / 4)(i3.astype(jnp.float32))

        u2 = _crop_like(_Up(up[5], dt)(i3), c1)
        d3u = _up2(disp3, c1).astype(dt)
        i2 = iconv(up[5], u2, c1, d3u)
        disp2 = SigmoidAffineHead(self.max_disp / 2)(i2.astype(jnp.float32))

        u1 = _crop_like(_Up(up[6], dt)(i2), x)
        d2u = _up2(disp2, x).astype(dt)
        i1 = iconv(up[6], u1, d2u)
        disp1 = SigmoidAffineHead(self.max_disp)(i1.astype(jnp.float32))

        _, h, w, _ = disp1.shape
        full = lambda d: resize_bilinear(d, h, w, align_corners=False)
        return (disp1, full(disp2), full(disp3), full(disp4))
