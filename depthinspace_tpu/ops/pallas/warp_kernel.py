"""Pallas TPU kernels for image resampling (gather-free).

Per-pixel gathers are catastrophically slow inside large XLA graphs on this
TPU stack (each lowers to a flat serialized dynamic-gather fusion, ~70-90 ms
per call at 32x512x432 — measured via scripts/trace_step.py). These kernels
replace them with *static-slice enumeration*: the integer part of the
sample offset is enumerated with statically-sliced shifted views (the same
technique as the census kernel), and per-pixel masks select the two
bilinear taps. All shifts are static, all ops are VPU-friendly, and the
custom VJPs write the adjoints with the same structure (no scatters).

Kernels:
- ``xwarp_disparity``: pattern sampled at u' = u - disp (border clamp,
  disparity in [0, max_disp]) — the photometric-loss warp (reference
  model/networks.py:358-367). Backward returns grad wrt disp only (the
  pattern is the constant projector reference).
- ``warp2d``: flow warp out(p) = img(p + flow(p)) with zeros padding
  (reference model/multi_frame_networks.py:83-99 and the geometric-loss
  samples, model/networks.py:578-595,633-649). Integer flow offsets are
  enumerated in [-max_shift, max_shift]^2; larger flows contribute zero
  (documented deviation: the reference's zeros padding produces zero for
  out-of-image samples; here additionally for beyond-range in-image flows
  — the consistency masks reject such pixels in practice). Backward
  returns (grad_img, grad_flow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_height(H: int) -> int:
    for bh in (64, 96, 80, 56, 32, 16, 8):
        if H % bh == 0:
            return bh
    return H


# ====================================================================
# x-only disparity warp (border clamp)
# ====================================================================

def _xwarp_fwd_kernel(pat_ref, i0_ref, f_ref, out_ref, *, BH, W, D):
    """pat_ref: (1, BH, W + D + 1) pattern padded LEFT by D (edge values);
    i0_ref: (1, 1, BH, W) int32 = D + floor(clip(u - disp)) - u  in [0, D];
    wait — i0 here is the *left-pad slice offset*: column c of slice k is
    pat_pad[c + k], and we need pat[clip(u-disp)] = pat_pad[D + x0 - ... ]:
    indices are precomputed on the XLA side as k0 = D + x0 - u + u = simply
    k0 = D - (u - x0) i.e. the shift amount; see _xwarp_host."""
    acc0 = jnp.zeros((BH, W), jnp.float32)
    acc1 = jnp.zeros((BH, W), jnp.float32)
    k0 = i0_ref[0, 0]
    f = f_ref[0, 0]
    for k in range(D + 1):
        sl = pat_ref[0, 0, :, k:k + W]
        hit = (k0 == k)
        acc0 = acc0 + jnp.where(hit, sl, 0.0)
        # x0 + 1 corresponds to shift k + 1
        sl1 = pat_ref[0, 0, :, k + 1:k + 1 + W]
        acc1 = acc1 + jnp.where(hit, sl1, 0.0)
    out_ref[0, 0] = acc0 * (1.0 - f) + acc1 * f


def _xwarp_grad_kernel(pat_ref, i0_ref, f_ref, inside_ref, g_ref, out_ref,
                       *, BH, W, D):
    """grad wrt disp = -(v1 - v0) * inside * g, with v0/v1 re-enumerated."""
    acc0 = jnp.zeros((BH, W), jnp.float32)
    acc1 = jnp.zeros((BH, W), jnp.float32)
    k0 = i0_ref[0, 0]
    for k in range(D + 1):
        sl = pat_ref[0, 0, :, k:k + W]
        sl1 = pat_ref[0, 0, :, k + 1:k + 1 + W]
        hit = (k0 == k)
        acc0 = acc0 + jnp.where(hit, sl, 0.0)
        acc1 = acc1 + jnp.where(hit, sl1, 0.0)
    out_ref[0, 0] = -(acc1 - acc0) * inside_ref[0, 0] * g_ref[0, 0]


def _xwarp_host(pattern, disp, max_disp):
    """Precompute shift indices/fractions. pattern (N,H,W); disp (N,H,W)."""
    N, H, W = disp.shape
    D = int(max_disp)
    u = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    x = u - disp
    xc = jnp.clip(x, 0.0, W - 1.0)
    x0 = jnp.floor(xc)
    f = (xc - x0).astype(jnp.float32)
    # pattern padded LEFT by D and RIGHT by 1 (edge): pat_pad[c] = pat[c - D]
    # sample pat[x0] = pat_pad[x0 + D] = slice k0 = x0 + D - u at column u.
    k0 = (x0 + D - u).astype(jnp.int32)
    k0 = jnp.clip(k0, 0, D)          # x0 <= u always (disp >= 0); safety
    inside = ((x > 0.0) & (x < W - 1.0)).astype(jnp.float32)
    pat_pad = jnp.pad(pattern, ((0, 0), (0, 0), (D, 1)), mode="edge")
    return pat_pad, k0, f, inside


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def xwarp_disparity(pattern, disp, max_disp=128):
    """pattern (N,H,W) sampled at u - disp, border clamp, disp in
    [0, max_disp]. Returns (N,H,W). Gradient flows to disp only."""
    out, _ = _xwarp_fwd(pattern, disp, max_disp)
    return out


def _reshape_bands(x, N, n_bands, BH, W):
    return x.reshape(N, n_bands, BH, W)


def _xwarp_fwd(pattern, disp, max_disp):
    N, H, W = disp.shape
    D = int(max_disp)
    BH = _band_height(H)
    n_bands = H // BH
    pat_pad, k0, f, inside = _xwarp_host(pattern, disp, max_disp)
    pat_b = pat_pad.reshape(N, n_bands, BH, W + D + 1)
    kernel = partial(_xwarp_fwd_kernel, BH=BH, W=W, D=D)
    out = pl.pallas_call(
        kernel,
        grid=(N, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, BH, W + D + 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_bands, BH, W), jnp.float32),
    )(pat_b, _reshape_bands(k0, N, n_bands, BH, W),
      _reshape_bands(f, N, n_bands, BH, W))
    return out.reshape(N, H, W), (pattern, disp)


def _xwarp_vjp_fwd(pattern, disp, max_disp):
    out, res = _xwarp_fwd(pattern, disp, max_disp)
    return out, res


def _xwarp_vjp_bwd(max_disp, res, g):
    pattern, disp = res
    N, H, W = disp.shape
    D = int(max_disp)
    BH = _band_height(H)
    n_bands = H // BH
    pat_pad, k0, f, inside = _xwarp_host(pattern, disp, max_disp)
    pat_b = pat_pad.reshape(N, n_bands, BH, W + D + 1)
    kernel = partial(_xwarp_grad_kernel, BH=BH, W=W, D=D)
    grad = pl.pallas_call(
        kernel,
        grid=(N, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, BH, W + D + 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BH, W), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n_bands, BH, W), jnp.float32),
    )(pat_b, _reshape_bands(k0, N, n_bands, BH, W),
      _reshape_bands(f, N, n_bands, BH, W),
      _reshape_bands(inside, N, n_bands, BH, W),
      _reshape_bands(g, N, n_bands, BH, W))
    return None, grad.reshape(N, H, W)


xwarp_disparity.defvjp(_xwarp_vjp_fwd, _xwarp_vjp_bwd)


# ====================================================================
# 2D flow warp (zeros padding), bounded integer shifts
# ====================================================================
#
# Sparsity: real flow fields are band-locally smooth, so a 16-row band
# touches only a small sub-rectangle of the (2D+2)^2 integer-offset space.
# The host precomputes per-(image, band) active *group ranges* (8 dy values
# per dy-group = one grid step; 8 dx values per dx-chunk = one guarded
# unrolled region) and the kernel skips inactive groups entirely via
# pl.when on scalar-prefetch values. Semantics are unchanged — skipped
# groups have zero hits by construction — but the typical cost drops from
# (2D+2)^2 enumerated offsets to the band's actual offset spread (measured
# ~6x on the DIS-SF geometric loss at 512x432).

def _warp2d_fwd_kernel(gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                       img_ref, ky_ref, kx_ref, wy0_ref, wx0_ref, out_ref,
                       *, BH, W, D):
    """Grid (M, n_bands, C, G): program g handles the 8 row offsets
    dy in [8g, 8g+8), and only runs if g is within the band's active
    dy-group range [gy0, gy1]. The band window (1,1,wh,wp) is loaded at the
    *8-aligned dynamic* offset 8g (Mosaic requires sublane alignment for
    dynamic offsets), then the 8 sub-offsets are static slices of the
    loaded value. dx offsets are enumerated in chunks of 8, each chunk
    guarded by the band's active dx-chunk range [gx0, gx1]. The out block
    is revisited across g (same index) and accumulated straight into the
    ref — one RMW per (dy,dx) offset (value accumulators across the
    unrolled loops blow the scoped-VMEM stack).

    wy0/wx0 are the bilinear tap weights (1-fy, 1-fx); the y0+1/x0+1 taps
    use (1-wy0)/(1-wx0) via the shifted compares ky==dy-1 / kx==dx-1."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    g = pl.program_id(3)
    GX = (2 * D + 2) // 8

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gx0 = gx0_ref[i, j]
    gx1 = gx1_ref[i, j]

    @pl.when((g >= gy0_ref[i, j]) & (g <= gy1_ref[i, j]))
    def _():
        ky = ky_ref[0, 0]
        kx = kx_ref[0, 0]
        wy0 = wy0_ref[0, 0]
        wx0 = wx0_ref[0, 0]
        base = pl.multiple_of(g * 8, 8)
        chunk = img_ref[0, 0, 0, pl.ds(base, BH + 8), :]
        for s in range(8):
            dy = g * 8 + s                  # traced, used only in compares
            row = chunk[s:s + BH, :]
            wy = (jnp.where(ky == dy, wy0, 0.0)
                  + jnp.where(ky == dy - 1, 1.0 - wy0, 0.0))
            for cx in range(GX):
                @pl.when((cx >= gx0) & (cx <= gx1))
                def _(row=row, wy=wy, cx=cx):
                    for t in range(8):
                        dx = cx * 8 + t
                        w = wy * (jnp.where(kx == dx, wx0, 0.0)
                                  + jnp.where(kx == dx - 1, 1.0 - wx0, 0.0))
                        out_ref[0, 0, 0] += w * row[:, dx:dx + W]


def _warp2d_adjoint_kernel(gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                           ky_ref, kx_ref, wy0_ref, wx0_ref, g_ref,
                           gout_ref, scratch, *, BH, W, D):
    """Adjoint: scatter the bilinearly-weighted upstream gradient into the
    padded band window (overlap-added outside). Grid (M, n_bands, C, G);
    program g owns window rows [8g, 8g + 8 + BH) — accumulated on a
    per-program scratch with *static* row/col slices (one RMW per offset
    and channel; the contribution to window position (dy, dx) sums the 4
    corners via shifted compares), then merged into the output at the
    8-aligned dynamic offset. Inactive dy-groups/dx-chunks are skipped via
    the same scalar-prefetch ranges as the forward kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    g = pl.program_id(3)
    GX = (2 * D + 2) // 8
    gup = g_ref[0, 0, 0]

    @pl.when(g == 0)
    def _():
        gout_ref[...] = jnp.zeros_like(gout_ref)

    gx0 = gx0_ref[i, j]
    gx1 = gx1_ref[i, j]

    @pl.when((g >= gy0_ref[i, j]) & (g <= gy1_ref[i, j]))
    def _():
        ky = ky_ref[0, 0]
        kx = kx_ref[0, 0]
        wy0 = wy0_ref[0, 0]
        wx0 = wx0_ref[0, 0]
        base = pl.multiple_of(g * 8, 8)
        scratch[...] = jnp.zeros_like(scratch)
        for s in range(8):
            dy = g * 8 + s
            wy = (jnp.where(ky == dy, wy0, 0.0)
                  + jnp.where(ky == dy - 1, 1.0 - wy0, 0.0))
            for cx in range(GX):
                @pl.when((cx >= gx0) & (cx <= gx1))
                def _(wy=wy, cx=cx, s=s):
                    for t in range(8):
                        dx = cx * 8 + t
                        w = wy * (jnp.where(kx == dx, wx0, 0.0)
                                  + jnp.where(kx == dx - 1, 1.0 - wx0, 0.0))
                        scratch[s:s + BH, dx:dx + W] += w * gup
        cur = gout_ref[0, 0, 0, pl.ds(base, BH + 8), :]
        gout_ref[0, 0, 0, pl.ds(base, BH + 8), :] = cur + scratch[...]


def _effective_shift(max_shift: int) -> int:
    """Round up so the dy range (2D+2) is a multiple of 8 (grid groups)."""
    import math
    G = math.ceil((2 * int(max_shift) + 2) / 8)
    return (8 * G - 2) // 2


def _warp2d_prep(img, flow, D):
    M, H, W = img.shape
    u = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    v = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    x = flow[..., 0] + u
    y = flow[..., 1] + v
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    kx = (x0 - u + D).astype(jnp.int32)
    ky = (y0 - v + D).astype(jnp.int32)
    return kx, ky, fx, fy


def _warp2d_ranges(ky, kx, n_bands, BH, D):
    """Per-(image, band) active dy-group / dx-chunk ranges (inclusive).

    A pixel with tap index k hits offsets {k, k+1}; pixels whose taps fall
    entirely outside the enumerated [0, 2D+1] range (flow beyond the shift
    budget — they contribute zero) are excluded so they don't widen the
    ranges. An all-excluded band yields the empty range (1, 0)."""
    M = ky.shape[0]
    lim = 2 * D + 1
    kyb = ky.reshape(M, n_bands, -1)
    kxb = kx.reshape(M, n_bands, -1)
    valid = ((kyb >= -1) & (kyb <= lim) & (kxb >= -1) & (kxb <= lim))
    big = jnp.int32(1 << 30)

    def rng(k):
        lo = jnp.min(jnp.where(valid, jnp.clip(k, 0, lim), big), axis=2)
        hi = jnp.max(jnp.where(valid, jnp.clip(k + 1, 0, lim), -big), axis=2)
        g0 = jnp.where(lo == big, 1, lo // 8).astype(jnp.int32)
        g1 = jnp.where(hi == -big, 0, hi // 8).astype(jnp.int32)
        return g0, g1

    gy0, gy1 = rng(kyb)
    gx0, gx1 = rng(kxb)
    return gy0, gy1, gx0, gx1


def _w2d_dims(H, W, D):
    # small bands: the compiler allocates a scoped-VMEM stack slot per
    # unrolled op, so iterations x band bytes must stay well under 16 MB
    BH = next((bh for bh in (16, 8) if H % bh == 0), H)
    n_bands = H // BH
    G = (2 * D + 2) // 8
    wh = BH + 2 * D + 8      # aligned chunks [8g, 8g+BH+8) stay in bounds
    wp = W + 2 * D + 2
    return BH, n_bands, G, wh, wp


def _windows2d(img_pad, n_bands, BH, wh):
    return jnp.stack([img_pad[:, j * BH:j * BH + wh, :]
                      for j in range(n_bands)], axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp2d(img, flow, max_shift=16):
    """out(p) = img(p + flow(p)), bilinear, zeros padding; integer flow
    offsets beyond the (rounded-up) +-max_shift contribute zero. img
    (M,H,W,C) NHWC (mask/tap weights are shared across channels);
    flow (M,H,W,2). Returns (M,H,W,C).

    NOTE: the backward pass produces gradients for ``img`` only — in this
    pipeline the flow is always input data (precomputed optical flow),
    never a differentiated quantity (reference geometric losses sample at
    flow-displaced coords of *data* flow, model/networks.py:578,633; the
    FuseNet feature warps are also by data flow). The flow cotangent is
    returned as zeros."""
    out, _ = _warp2d_fwd(img, flow, max_shift)
    return out


def _warp2d_fwd(img, flow, max_shift):
    D = _effective_shift(max_shift)
    M, H, W, C = img.shape
    BH, n_bands, G, wh, wp = _w2d_dims(H, W, D)
    kx, ky, fx, fy = _warp2d_prep(img[..., 0], flow, D)
    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    img_chw = jnp.moveaxis(img, -1, 1)                     # (M, C, H, W)
    img_pad = jnp.pad(img_chw, ((0, 0), (0, 0), (D, D + 8), (D, D + 2)))
    # overlapping band windows: (M, n_bands, C, wh, wp)
    img_w = jnp.stack([img_pad[:, :, j * BH:j * BH + wh, :]
                       for j in range(n_bands)], axis=1)
    kernel = partial(_warp2d_fwd_kernel, BH=BH, W=W, D=D)
    blk = lambda: pl.BlockSpec((1, 1, BH, W),
                               lambda i, j, c, g, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M, n_bands, C, G),
        in_specs=[
            pl.BlockSpec((1, 1, 1, wh, wp),
                         lambda i, j, c, g, *_: (i, j, c, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(), blk(), blk(), blk(),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, BH, W),
                               lambda i, j, c, g, *_: (i, j, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, n_bands, C, BH, W), jnp.float32),
    )(gy0, gy1, gx0, gx1,
      img_w, shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx))
    out = jnp.moveaxis(out.reshape(M, n_bands, C, BH, W), 2, 1)
    out = out.reshape(M, C, H, W)
    return jnp.moveaxis(out, 1, -1), (flow,)


def _warp2d_bwd(max_shift, res, g):
    D = _effective_shift(max_shift)
    (flow,) = res
    M, H, W, C = g.shape
    BH, n_bands, G, wh, wp = _w2d_dims(H, W, D)
    kx, ky, fx, fy = _warp2d_prep(g[..., 0], flow, D)

    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    g_chw = jnp.moveaxis(g, -1, 1)                          # (M, C, H, W)
    g_b = g_chw.reshape(M, C, n_bands, BH, W)
    g_b = jnp.moveaxis(g_b, 1, 2)                           # (M,nb,C,BH,W)
    kernel = partial(_warp2d_adjoint_kernel, BH=BH, W=W, D=D)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)
    blk = lambda: pl.BlockSpec((1, 1, BH, W),
                               lambda i, j, c, g_, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M, n_bands, C, G),
        in_specs=[blk(), blk(), blk(), blk(),
                  pl.BlockSpec((1, 1, 1, BH, W),
                               lambda i, j, c, g_, *_: (i, j, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 1, wh, wp),
                               lambda i, j, c, g_, *_: (i, j, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BH + 8, wp), jnp.float32)],
    )
    grad_w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, n_bands, C, wh, wp), jnp.float32),
    )(gy0, gy1, gx0, gx1,
      shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx), g_b)
    # overlap-add the band windows into the padded plane, then crop the pad
    grad_pad = jnp.zeros((M, C, H + 2 * D + 8, wp), jnp.float32)
    for j in range(n_bands):
        grad_pad = grad_pad.at[:, :, j * BH:j * BH + wh, :].add(
            grad_w[:, j])
    grad_img = grad_pad[:, :, D:D + H, D:D + W]
    return jnp.moveaxis(grad_img, 1, -1), jnp.zeros_like(flow)


warp2d.defvjp(_warp2d_fwd, _warp2d_bwd)


# alias: warp2d already takes NHWC
warp2d_nhwc = warp2d
