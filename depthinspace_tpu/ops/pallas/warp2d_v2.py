"""warp2d v2: channel-blocked flow warp with in-kernel DMA.

Same semantics as :func:`.warp_kernel.warp2d` (out(p) = img(p + flow(p)),
bilinear, zeros padding, integer offsets beyond the rounded-up +-max_shift
contribute zero, gradient to img only) — re-engineered around the two cost
drivers the v1 kernel left on the table (measured on the DIS-MF step trace):

1. **Window stacking**: v1 materializes overlapping per-band windows on the
   XLA side ((BH+2D+8)/BH ~ 3.9x duplication of the padded image — ~300 ms
   of layout copies per MF step).  v2 keeps the padded image in ANY (HBM)
   memory and each program DMAs just its (C_blk, BH+8, wp) chunk into a
   VMEM scratch (``pltpu.make_async_copy``), at the 8-aligned row offset
   j*BH + 8g.
2. **Per-channel programs**: v1 puts C in the grid, so the per-pixel tap
   compare masks are recomputed for every channel and the grid has
   M*nb*C*G programs (122k for the FuseNet feature warps — dispatch alone
   is tens of ms).  v2 processes ``C_blk`` channels per program: masks are
   computed once per offset and applied as (C_blk, BH, W) vector RMWs.

The backward pass accumulates each band's scatter window directly into a
per-(image, channel-block) padded-plane VMEM block (revisited across the
(band, dy-group) grid dims), removing v1's XLA-side overlap-add
(dynamic-update-slice chain, ~67 ms/step).

Scoped-VMEM budget: the compiler allocates a stack slot per unrolled RMW.
The fwd kernel therefore accumulates each dx-chunk's 64 taps into a value
and RMWs once per chunk (GX slots/program) — freeing the budget to run
C_blk = the full channel count of the FuseNet feature warps, which
amortizes the per-tap mask arithmetic (the dominant VPU cost at small
C_blk) across channels.  The bwd scatter RMWs per tap, so its C_blk stays
budget-limited (:func:`_pick_cblk`).

Reference behavior: model/multi_frame_networks.py:83-99 (zeros-padding
bilinear warp); geometric-loss samples model/networks.py:578-595,633-649.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp_kernel import (_effective_shift, _warp2d_prep, _warp2d_ranges)


def _divisor_blocks(C: int):
    return [c for c in (2, 3, 4, 5, 6, 8, 16, 32) if C % c == 0]


def _pick_cblk(C: int, BH: int, W: int, G: int) -> int:
    """(bwd) Largest channel block keeping the per-tap unrolled-RMW
    scoped-VMEM footprint under ~9 MB (8 dy x 8G dx RMW slots)."""
    import os
    if os.environ.get("DIS_WARP_CBLK_BWD"):
        return int(os.environ["DIS_WARP_CBLK_BWD"])
    ops = 8 * (8 * G)
    budget = 9 * 2 ** 20
    cb = 1
    for cand in _divisor_blocks(C):
        if ops * cand * BH * W * 4 <= budget:
            cb = cand
    return cb


def _pick_cblk_fwd(C: int, BH: int, W: int, G: int) -> int:
    """(fwd) Channel block for the value-accumulating forward kernel.

    The fwd kernel accumulates all 64 (dy, dx) taps of a dx-chunk into a
    value and issues ONE ref RMW per chunk.  Measured on v5e (Mosaic
    scoped-VMEM OOM report at C_blk=32, BH=16, W=216: 26.88 MB ≈ 64 x
    C_blk*BH*W*4B): the compiler allocates a stack slot per *unrolled
    add in one chunk body* (slots are reused across the GX chunks), so
    the footprint is 64 * C_blk*BH*W*4B plus the scoped image chunk
    (C_blk*(BH+8)*WP*4B).  Still 8*G x smaller than the per-tap-RMW
    model of :func:`_pick_cblk`, which is what lets C_blk grow past 1
    and amortize the per-tap mask arithmetic across channels."""
    import os
    if os.environ.get("DIS_WARP_CBLK_FWD"):
        return int(os.environ["DIS_WARP_CBLK_FWD"])
    wp_bound = (W + 16 * G + 130) // 128 * 128   # upper bound on padded W
    budget = 9 * 2 ** 20
    cb = 1
    for cand in _divisor_blocks(C):
        if cand * (64 * BH * W + (BH + 8) * wp_bound) * 4 <= budget:
            cb = cand
    return cb


def _fwd_kernel(gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                img_ref, ky_ref, kx_ref, wy0_ref, wx0_ref, out_ref,
                *, BH, W, D, C_blk, WP, dtype):
    """Grid (M, nb, C//C_blk, G). img_ref: full (M, C, Hp, wp) in ANY
    memory (f32 or bf16 — accumulation into the f32 out block promotes);
    out block (1, 1, C_blk, BH, W) revisited across g."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = pl.program_id(2)
    g = pl.program_id(3)
    GX = (2 * D + 2) // 8

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gx0 = gx0_ref[i, j]
    gx1 = gx1_ref[i, j]

    @pl.when((g >= gy0_ref[i, j]) & (g <= gy1_ref[i, j]))
    def _():
        def body(chunk, sem):
            row0 = pl.multiple_of(j * BH + 8 * g, 8)
            dma = pltpu.make_async_copy(
                img_ref.at[i, pl.ds(c * C_blk, C_blk),
                           pl.ds(row0, BH + 8), :],
                chunk, sem)
            dma.start()
            dma.wait()
            ky = ky_ref[0, 0]
            kx = kx_ref[0, 0]
            wy0 = wy0_ref[0, 0]
            wx0 = wx0_ref[0, 0]
            # one upfront f32 convert (bf16 chunks) instead of one per tap
            ch = chunk[...].astype(jnp.float32)
            # dy weights for the group's 8 rows, hoisted out of the dx loop
            wy = []
            for s in range(8):
                dy = g * 8 + s            # traced, used only in compares
                wy.append(jnp.where(ky == dy, wy0, 0.0)
                          + jnp.where(ky == dy - 1, 1.0 - wy0, 0.0))
            for cx in range(GX):
                @pl.when((cx >= gx0) & (cx <= gx1))
                def _(cx=cx):
                    # value-accumulate the chunk's 64 taps -> ONE ref RMW:
                    # keeps the compiler's per-unrolled-RMW scoped-VMEM
                    # slots at GX per program (enables a big C_blk, see
                    # _pick_cblk_fwd)
                    acc = jnp.zeros((C_blk, BH, W), jnp.float32)
                    for s in range(8):
                        for t in range(8):
                            dx = cx * 8 + t
                            w = wy[s] * (jnp.where(kx == dx, wx0, 0.0)
                                         + jnp.where(kx == dx - 1,
                                                     1.0 - wx0, 0.0))
                            acc = acc + w[None] * ch[:, s:s + BH, dx:dx + W]
                    out_ref[0, 0] += acc

        pl.run_scoped(body,
                      pltpu.VMEM((C_blk, BH + 8, WP), dtype),
                      pltpu.SemaphoreType.DMA(()))


def _bwd_kernel(gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                ky_ref, kx_ref, wy0_ref, wx0_ref, g_ref,
                gout_ref, scratch, *, BH, W, D, C_blk):
    """Grid (M, C//C_blk, nb, G) — (band, dy-group) LAST so the padded-plane
    out block (1, C_blk, Hp, wp) is revisited consecutively.  Each active
    program scatters its band's weighted gradient into ``scratch`` then
    adds it to the plane at the 8-aligned row offset."""
    i = pl.program_id(0)
    j = pl.program_id(2)
    g = pl.program_id(3)
    GX = (2 * D + 2) // 8

    @pl.when((j == 0) & (g == 0))
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
        gup = g_ref[0, :, 0].astype(jnp.float32)   # (C_blk, BH, W)
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
                        scratch[:, s:s + BH, dx:dx + W] += w[None] * gup
        row0 = pl.multiple_of(j * BH + 8 * g, 8)
        cur = gout_ref[0, :, pl.ds(row0, BH + 8), :]
        gout_ref[0, :, pl.ds(row0, BH + 8), :] = cur + scratch[...]


def _v2_dims(H, W, D):
    BH = next((bh for bh in (16, 8) if H % bh == 0), H)
    n_bands = H // BH
    G = (2 * D + 2) // 8
    # lane-dim (last-dim) slices of a VMEM memref must be 128-aligned for
    # the in-kernel DMA -> round the padded width up to a lane-tile multiple
    wp = -(-(W + 2 * D + 2) // 128) * 128
    return BH, n_bands, G, wp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp2d_v2(img, flow, max_shift=16):
    """Drop-in replacement for warp2d (same contract; see module docstring).
    img (M,H,W,C) NHWC f32 or bf16; flow (M,H,W,2). Returns (M,H,W,C) in
    img's dtype. Tap weights and accumulation stay f32 either way; a bf16
    img halves the in-kernel DMA traffic and skips the XLA-side f32
    round-trip copies."""
    out, _ = _v2_fwd(img, flow, max_shift)
    return out


def _v2_fwd(img, flow, max_shift):
    D = _effective_shift(max_shift)
    M, H, W, C = img.shape
    dtype = img.dtype
    BH, n_bands, G, wp = _v2_dims(H, W, D)
    # tap prep always in f32: bf16 pixel coordinates (values up to H/W)
    # would quantize the floor/frac decomposition by whole pixels
    kx, ky, fx, fy = _warp2d_prep(img[..., 0].astype(jnp.float32),
                                  flow.astype(jnp.float32), D)
    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    C_blk = _pick_cblk_fwd(C, BH, W, G)

    img_chw = jnp.moveaxis(img, -1, 1)                       # (M, C, H, W)
    # rows: D top, 8G-D bottom (total Hp = H + 8G) so every chunk
    # [jBH + 8g, +BH+8) is in bounds (max end = H + 8G); cols D left,
    # wp-W-D right (wp is lane-tile-rounded).
    img_pad = jnp.pad(img_chw, ((0, 0), (0, 0), (D, 8 * G - D),
                                (D, wp - W - D)))

    kernel = partial(_fwd_kernel, BH=BH, W=W, D=D, C_blk=C_blk, WP=wp,
                     dtype=dtype)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)
    blk = lambda: pl.BlockSpec((1, 1, BH, W),
                               lambda i, j, c, g, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M, n_bands, C // C_blk, G),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            blk(), blk(), blk(), blk(),
        ],
        out_specs=pl.BlockSpec((1, 1, C_blk, BH, W),
                               lambda i, j, c, g, *_: (i, j, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, n_bands, C, BH, W), jnp.float32),
    )(gy0, gy1, gx0, gx1,
      img_pad, shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx))
    out = jnp.moveaxis(out.reshape(M, n_bands, C, BH, W), 2, 1)
    out = out.reshape(M, C, H, W).astype(dtype)
    return jnp.moveaxis(out, 1, -1), (flow,)


def _v2_bwd(max_shift, res, g):
    D = _effective_shift(max_shift)
    (flow,) = res
    M, H, W, C = g.shape
    BH, n_bands, G, wp = _v2_dims(H, W, D)
    kx, ky, fx, fy = _warp2d_prep(g[..., 0].astype(jnp.float32),
                                  flow.astype(jnp.float32), D)
    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    C_blk = _pick_cblk(C, BH, W, G)
    Hp = H + 8 * G                         # same padded-plane rows as fwd

    g_chw = jnp.moveaxis(g, -1, 1)                           # (M, C, H, W)
    g_b = g_chw.reshape(M, C, n_bands, BH, W)

    kernel = partial(_bwd_kernel, BH=BH, W=W, D=D, C_blk=C_blk)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)
    blk = lambda: pl.BlockSpec((1, 1, BH, W),
                               lambda i, c, j, g_, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(M, C // C_blk, n_bands, G),
        in_specs=[
            blk(), blk(), blk(), blk(),
            pl.BlockSpec((1, C_blk, 1, BH, W),
                         lambda i, c, j, g_, *_: (i, c, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C_blk, Hp, wp),
                               lambda i, c, j, g_, *_: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C_blk, BH + 8, wp), jnp.float32)],
    )
    grad_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, C, Hp, wp), jnp.float32),
    )(gy0, gy1, gx0, gx1,
      shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx), g_b)
    grad_img = grad_pad[:, :, D:D + H, D:D + W].astype(g.dtype)
    return jnp.moveaxis(grad_img, 1, -1), jnp.zeros_like(flow)


warp2d_v2.defvjp(lambda img, flow, ms: _v2_fwd(img, flow, ms), _v2_bwd)
