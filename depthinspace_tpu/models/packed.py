"""Frame-packed convolution primitives for FuseNet.

Every 2D conv in FuseNet applies the SAME weights independently to the
``tl`` frames of a track (the reference loops frames through one module,
model/multi_frame_networks.py:216-267).  Executed frame-major —
``(tl*N, h, w, C)`` with C=16..32 — each conv runs at ~5% MXU utilization
on v5e: small-C bf16 convs pick a W-on-lanes layout, pay ~1.4 ms of fixed
layout/compute overhead per call, and force 56 MB transpose copies at
every conv<->elementwise boundary (measured: 70 such copies, ~300 ms of a
1.23 s DIS-MF step; scripts/bench_conv_layout.py, bench_conv_variants.py).

Packing the frame axis into channels — ``(N, h, w, tl*C)`` with
``feature_group_count=tl`` grouped convolutions and weights tiled across
groups — runs the identical math at C=128, which fills the 128-wide lane
dimension exactly: measured 72% MXU utilization at C=128 vs 5.5% at C=32,
and the canonical C-minor layout is shared with the surrounding
elementwise ops so the boundary copies disappear.

Parameter trees are IDENTICAL to the frame-major modules they replace
(kernel (kh, kw, Cin, F) shared across frames; GroupNorm scale/bias (C,)),
so checkpoints are interchangeable between the packed and frame-major
FuseNet paths.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def pack_frames(x: jax.Array, groups: int) -> jax.Array:
    """(G*N, h, w, C) frame-major -> (N, h, w, G*C) frame-packed.

    Group g of the output channel axis holds frame g's channels:
    out[n, :, :, g*C:(g+1)*C] = x[g*N + n].
    """
    G = groups
    gn, h, w, c = x.shape
    n = gn // G
    x = x.reshape(G, n, h, w, c)
    x = jnp.moveaxis(x, 0, 3)                    # (n, h, w, G, c)
    return x.reshape(n, h, w, G * c)


def unpack_frames(x: jax.Array, groups: int) -> jax.Array:
    """(N, h, w, G*C) frame-packed -> (G*N, h, w, C) frame-major."""
    G = groups
    n, h, w, gc = x.shape
    c = gc // G
    x = x.reshape(n, h, w, G, c)
    x = jnp.moveaxis(x, 3, 0)                    # (G, n, h, w, c)
    return x.reshape(G * n, h, w, c)


def pack_concat(xs, groups: int) -> jax.Array:
    """Concatenate frame-packed tensors along the per-frame channel axis.

    [(N,h,w,G*C1), (N,h,w,G*C2), ...] -> (N,h,w,G*(C1+C2+...)) keeping each
    group's channels contiguous (a plain channel concat would interleave
    frame groups)."""
    G = groups
    parts = []
    for x in xs:
        n, h, w, gc = x.shape
        parts.append(x.reshape(n, h, w, G, gc // G))
    return jnp.concatenate(parts, axis=-1).reshape(
        parts[0].shape[0], parts[0].shape[1], parts[0].shape[2], -1)


class PackedConv(nn.Module):
    """Grouped conv over a frame-packed tensor with frame-shared weights.

    Parameter-compatible with ``nn.Conv(features, kernel_size)`` applied
    frame-major: kernel (kh, kw, Cin, features), bias (features,).  Input
    (N, h, w, G*Cin) -> output (N, h, w, G*features).
    """
    features: int
    kernel_size: Tuple[int, int]
    groups: int
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        G = self.groups
        cin = x.shape[-1] // G
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), jnp.float32)
        dt = self.dtype
        # BLOCK-DIAGONAL dense, not feature_group_count: the v5e lowering
        # of grouped convs is SLOWER than separate small convs (measured
        # 14.8 vs 11.9 ms for 8 layers at this shape), while the dense
        # C=128 conv with 3/4 structurally-zero weights runs 2.8x FASTER
        # (4.2 ms) — the MXU does the zero FLOPs for free
        # (scripts/bench_conv_grouped.py)
        eye = jnp.eye(G, dtype=dt)
        w = jnp.einsum("hwio,gG->hwgiGo", kernel.astype(dt), eye)
        w = w.reshape(kh, kw, G * cin, G * self.features)
        y = lax.conv_general_dilated(
            x.astype(dt), w, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.tile(bias.astype(dt), (G,))
        return y


class PackedGroupNorm(nn.Module):
    """``nn.GroupNorm(num_groups=1)`` applied per frame of a frame-packed
    tensor: normalizes each frame group over (h, w, C) separately, with the
    frame-shared (C,) scale/bias parameterization of the frame-major
    module (flax GroupNorm: f32 statistics, epsilon 1e-6)."""
    groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        G = self.groups
        n, h, w, gc = x.shape
        c = gc // G
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32).reshape(n, h, w, G, c)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.reshape(n, h, w, gc).astype(self.dtype)


class PackedResNetBlock(nn.Module):
    """Frame-packed twin of :class:`..models.fusenet.ResNetBlock` — child
    module names match its auto-generated names (Conv_0/GroupNorm_0/...)
    so parameter trees are interchangeable."""
    features: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        G = self.groups
        y = PackedConv(self.features, (3, 3), G, dtype=dt, name="Conv_0")(x)
        y = nn.selu(y)
        y = PackedGroupNorm(G, dtype=dt, name="GroupNorm_0")(y)
        y = PackedConv(self.features, (3, 3), G, dtype=dt, name="Conv_1")(y)
        y = PackedGroupNorm(G, dtype=dt, name="GroupNorm_1")(y)
        return nn.selu(y + x)
