"""Output-head variants (reference OutputLayerFactory,
model/networks.py:74-166): linear / disp / disp_row / pos / pos_row.

Only 'disp' is exercised by the default pipeline (reference
model/networks.py:304); the row/positional variants are provided for API
parity. The per-row linear layer is one batched einsum instead of the
reference's per-row module loop (model/networks.py:152-166) — H tiny
matmuls fold into a single (H, W?, C_in, C_out) contraction on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .dispnet import SigmoidAffineHead


class MultiLinear(nn.Module):
    """Independent linear map per image row: (N,H,W,Ci) -> (N,H,W,Co)."""
    height: int
    features: int

    @nn.compact
    def __call__(self, x):
        n, h, w, ci = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.height, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.height, self.features))
        y = jnp.einsum("nhwc,hcf->nhwf", x, kernel,
                       preferred_element_type=jnp.float32)
        return y + bias[None, :, None, :]


class SigmoidAffine(nn.Module):
    """sigmoid(x/gamma - offset) * alpha + beta (reference :140-149)."""
    alpha: float = 1.0
    beta: float = 0.0
    gamma: float = 1.0
    offset: float = 0.0

    @nn.compact
    def __call__(self, x):
        return (jax.nn.sigmoid(x / self.gamma - self.offset) * self.alpha
                + self.beta)


class DispRowHead(nn.Module):
    """Per-row linear + SigmoidAffine ('disp_row', reference :127-131)."""
    height: int
    alpha: float
    beta: float = 0.0
    gamma: float = 1.0
    offset: float = 3.0

    @nn.compact
    def __call__(self, x):
        y = MultiLinear(self.height, 1)(x)
        return SigmoidAffine(self.alpha, self.beta, self.gamma,
                             self.offset)(y)


class PosOutput(nn.Module):
    """Absolute-position head: disp = u - pos(x) ('pos'/'pos_row',
    reference :74-99)."""
    kind: str = "pos"              # 'pos' | 'pos_row'
    height: Optional[int] = None
    alpha: float = 1.0
    beta: float = 0.0
    gamma: float = 1.0
    offset: float = 0.0

    @nn.compact
    def __call__(self, x):
        if self.kind == "pos":
            pos = nn.Conv(1, (3, 3), padding="SAME")(x)
        elif self.kind == "pos_row":
            pos = MultiLinear(self.height or x.shape[1], 1)(x)
        else:
            raise ValueError(self.kind)
        pos = SigmoidAffine(self.alpha, self.beta, self.gamma,
                            self.offset)(pos)
        u = jnp.arange(x.shape[2], dtype=pos.dtype)[None, None, :, None]
        return u - pos


def pos_to_depth(pos: jax.Array, focal_length: float, baseline: float):
    """disp = u - pos, then disparity -> depth (reference PosToDepth,
    model/networks.py:321-333)."""
    from ..ops.geometry import disp_to_depth
    u = jnp.arange(pos.shape[2], dtype=pos.dtype)[None, None, :, None]
    return disp_to_depth(u - pos, focal_length, baseline)


def make_output_head(kind: str = "disp", *, height: Optional[int] = None,
                     **params) -> nn.Module:
    """Factory matching the reference's OutputLayerFactory type enum."""
    if kind == "linear":
        return nn.Conv(1, (3, 3), padding="SAME")
    if kind == "disp":
        return SigmoidAffineHead(**params)
    if kind == "disp_row":
        return DispRowHead(height=height, **params)
    if kind in ("pos", "pos_row"):
        return PosOutput(kind=kind, height=height, **params)
    raise ValueError(f"unknown output head {kind!r}")
