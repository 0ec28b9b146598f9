"""Fused Pallas TPU kernel for the census-SAD photometric dissimilarity.

Replaces the reference's hand-written CUDA op (reference
model/ext_functions.py:115-154: ``photometric_loss_forward/backward``,
census_sad, block 9, eps 0.5) with a TPU kernel that keeps the whole BxB
stencil in VMEM:

- the portable jnp path (ops/census.py) streams 81 shifted slices through
  HBM; this kernel reads each input tile once and runs the 81-offset
  stencil on the VPU from VMEM — HBM-bound -> compute-bound;
- Mosaic constraints shape the implementation: dynamic sublane offsets
  must be 8-aligned, so row offsets (dy) are *static* slices; column
  offsets (dx) are *lane rolls* (roll by Wp-dx, use columns [0, W) — the
  pad region absorbs the wraparound); a fully unrolled kernel over the
  whole image blew the 16 MB scoped-VMEM stack, so the grid tiles the
  image over row bands whose overlapping halo windows are materialized by
  XLA before the call (overlap is not expressible in a BlockSpec);
- the backward pass is the hand-derived adjoint (per-offset sensitivities
  scattered via lane rolls + row-band accumulation + center correction),
  with the replicate-padding fold-back and the band-overlap summation as
  cheap XLA ops outside the kernel. Like the reference CUDA op, gradients
  are produced for ``es`` only (model/ext_functions.py:140).

Numerics are validated against ops/census.py (which matches the
reference's pure-PyTorch oracle) by scripts/check_pallas_tpu.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _band_height(H: int) -> int:
    """Output rows per grid step: largest preferred divisor of H."""
    for bh in (64, 96, 80, 56, 32, 16, 8):
        if H % bh == 0:
            return bh
    return H


def _h(d, eps):
    return 0.5 * (1.0 + d * lax.rsqrt(d * d + eps))


def _fwd_kernel(es_ref, ta_ref, out_ref, *, BH, W, B, eps):
    # Static (unaligned) 2D slices of the VMEM refs — Mosaic supports these;
    # dynamic sublane offsets and pltpu.roll by non-128 shifts do not lower.
    p = B // 2
    es_c = es_ref[0, 0, p:p + BH, p:p + W]
    ta_c = ta_ref[0, 0, p:p + BH, p:p + W]
    acc = jnp.zeros((BH, W), jnp.float32)
    for dy in range(B):
        for dx in range(B):
            d_es = es_ref[0, 0, dy:dy + BH, dx:dx + W] - es_c
            d_ta = ta_ref[0, 0, dy:dy + BH, dx:dx + W] - ta_c
            acc = acc + jnp.abs(_h(d_es, eps) - _h(d_ta, eps))
    out_ref[0, 0] = acc * (1.0 / (B * B))


def _bwd_kernel(es_ref, ta_ref, g_ref, gout_ref, *, BH, W, B, eps):
    p = B // 2
    es_c = es_ref[0, 0, p:p + BH, p:p + W]
    ta_c = ta_ref[0, 0, p:p + BH, p:p + W]
    g = g_ref[0, 0]
    inv_b2 = 1.0 / (B * B)
    gout_ref[...] = jnp.zeros_like(gout_ref)
    center = jnp.zeros((BH, W), jnp.float32)
    for dy in range(B):
        for dx in range(B):
            d_es = es_ref[0, 0, dy:dy + BH, dx:dx + W] - es_c
            d_ta = ta_ref[0, 0, dy:dy + BH, dx:dx + W] - ta_c
            h_diff = _h(d_es, eps) - _h(d_ta, eps)
            q = d_es * d_es + eps
            dh = 0.5 * eps * lax.rsqrt(q) / q
            s = jnp.sign(h_diff) * dh * g * inv_b2
            gout_ref[0, 0, dy:dy + BH, dx:dx + W] += s
            center = center + s
    gout_ref[0, 0, p:p + BH, p:p + W] -= center


def _pad_edge(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="edge")


def _unpad_edge_adjoint(g_pad, p):
    core = g_pad[:, p:-p, :]
    core = core.at[:, 0, :].add(g_pad[:, :p, :].sum(axis=1))
    core = core.at[:, -1, :].add(g_pad[:, -p:, :].sum(axis=1))
    out = core[:, :, p:-p]
    out = out.at[:, :, 0].add(core[:, :, :p].sum(axis=2))
    out = out.at[:, :, -1].add(core[:, :, -p:].sum(axis=2))
    return out


def _windows(x_pad, n_bands, BH, band_h):
    """(N, Hp, Wp) -> (N, n_bands, band_h, Wp) overlapping row bands."""
    return jnp.stack([x_pad[:, j * BH:j * BH + band_h, :]
                      for j in range(n_bands)], axis=1)


def _forward(es, ta, block_size, eps):
    N, H, W = es.shape
    p = block_size // 2
    BH = _band_height(H)
    n_bands = H // BH
    band_h = BH + 2 * p
    Wp = W + 2 * p
    es_w = _windows(_pad_edge(es, p), n_bands, BH, band_h)
    ta_w = _windows(_pad_edge(ta, p), n_bands, BH, band_h)
    kernel = partial(_fwd_kernel, BH=BH, W=W, B=block_size, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(N, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, band_h, Wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, band_h, Wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_bands, BH, W), jnp.float32),
    )(es_w, ta_w)
    return out.reshape(N, H, W)


def _backward(es, ta, g, block_size, eps):
    N, H, W = es.shape
    p = block_size // 2
    BH = _band_height(H)
    n_bands = H // BH
    band_h = BH + 2 * p
    Wp = W + 2 * p
    es_w = _windows(_pad_edge(es, p), n_bands, BH, band_h)
    ta_w = _windows(_pad_edge(ta, p), n_bands, BH, band_h)
    g_w = g.reshape(N, n_bands, BH, W)
    kernel = partial(_bwd_kernel, BH=BH, W=W, B=block_size, eps=eps)
    grad_w = pl.pallas_call(
        kernel,
        grid=(N, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, band_h, Wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, band_h, Wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, band_h, Wp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_bands, band_h, Wp), jnp.float32),
    )(es_w, ta_w, g_w)
    # sum the overlapping band contributions back into the padded plane
    grad_pad = jnp.zeros((N, H + 2 * p, Wp), jnp.float32)
    for j in range(n_bands):
        grad_pad = grad_pad.at[:, j * BH:j * BH + band_h, :].add(grad_w[:, j])
    return _unpad_edge_adjoint(grad_pad, p)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _census_sad_pallas(es, ta, block_size=9, eps=0.5):
    return _forward(es, ta, block_size, eps)


def _vjp_fwd(es, ta, block_size, eps):
    return _forward(es, ta, block_size, eps), (es, ta)


def _vjp_bwd(block_size, eps, res, g):
    es, ta = res
    return _backward(es, ta, g, block_size, eps), jnp.zeros_like(ta)


_census_sad_pallas.defvjp(_vjp_fwd, _vjp_bwd)

census_sad_pallas = jax.jit(_census_sad_pallas, static_argnums=(2, 3))


def census_sad_auto(es, ta, block_size=9, eps=0.5):
    """Backend dispatch: Pallas kernel on TPU, scan path elsewhere.

    Like the reference's cuda/cpu split (model/ext_functions.py:122-127),
    both paths implement identical math."""
    from ..census import census_sad
    if jax.default_backend() == "tpu" and es.shape[-2] % 8 == 0:
        return census_sad_pallas(es, ta, block_size, eps)
    return census_sad(es, ta, block_size, eps)
