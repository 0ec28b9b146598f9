"""warp2d_pairs: pair-indexed flow warp — in-kernel gather over source planes.

The DIS-MF fusion blocks warp the SAME ``tl*N`` feature planes along
``tl*(tl-1)*N`` (target, source) pairs (reference FuseNet gather_warped_feat,
model/multi_frame_networks.py:347-360).  :func:`.warp2d_v2.warp2d_v2` needs
the sources materialized pair-major, so every block pays an XLA-side
stack + NHWC->NCHW move + zero-pad of a 3x-duplicated tensor on the forward
pass, and the backward produces a pair-major padded gradient that XLA then
slices and sums back per source plane.

Here the pair->source mapping moves INTO the kernel:

- forward: the padded source planes stay (S, C, Hp, wp) in ANY/HBM memory;
  each program DMAs its band chunk from plane ``src_idx[pair]`` (scalar-
  prefetched), so the 3x pair-major duplication never exists in memory.
- backward: the grid iterates (source, pair-of-source) with the source axis
  outermost, accumulating every pair's scatter directly into that source's
  padded gradient plane — consecutive output-block revisits, no pair-major
  intermediate, no XLA-side sum.

Same tap semantics as warp2d_v2 (bilinear, zeros padding, +-max_shift
enumeration window, gradient to the image only); ``src_idx`` is static
(a Python tuple), and every source plane must appear in exactly
``M // S`` pairs (true by construction for the all-pairs track layout).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp_kernel import (_effective_shift, _warp2d_prep, _warp2d_ranges)
from .warp2d_v2 import (_pick_cblk, _pick_cblk_fwd, _v2_dims)


def _fwd_kernel(src_ref, gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                img_ref, ky_ref, kx_ref, wy0_ref, wx0_ref, out_ref,
                *, BH, W, D, C_blk, WP, dtype):
    """Grid (M, nb, C//C_blk, G).  img_ref: (S, C, Hp, wp) in ANY memory;
    the only difference from warp2d_v2._fwd_kernel is the DMA source plane
    ``src_ref[i]`` instead of ``i``."""
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
                img_ref.at[src_ref[i], pl.ds(c * C_blk, C_blk),
                           pl.ds(row0, BH + 8), :],
                chunk, sem)
            dma.start()
            dma.wait()
            ky = ky_ref[0, 0]
            kx = kx_ref[0, 0]
            wy0 = wy0_ref[0, 0]
            wx0 = wx0_ref[0, 0]
            ch = chunk[...].astype(jnp.float32)
            wy = []
            for s in range(8):
                dy = g * 8 + s
                wy.append(jnp.where(ky == dy, wy0, 0.0)
                          + jnp.where(ky == dy - 1, 1.0 - wy0, 0.0))
            for cx in range(GX):
                @pl.when((cx >= gx0) & (cx <= gx1))
                def _(cx=cx):
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


def _bwd_kernel(ptab_ref, gy0_ref, gy1_ref, gx0_ref, gx1_ref,
                ky_ref, kx_ref, wy0_ref, wx0_ref, g_ref,
                gout_ref, scratch, *, BH, W, D, C_blk, K):
    """Grid (S, C//C_blk, K, nb, G) — the (source, channel-block) axes
    OUTERMOST (and the pair axis k inside c) so each padded source-gradient
    plane block (1, C_blk, Hp, wp) is revisited consecutively across its K
    pairs, bands, and dy-groups.  The pair index ``m = ptab_ref[s*K + k]``
    addresses the scalar-prefetched tap arrays; the per-pair upstream-
    gradient block is fetched by the same mapping in its BlockSpec
    index_map."""
    s_id = pl.program_id(0)
    k_id = pl.program_id(2)
    j = pl.program_id(3)
    g = pl.program_id(4)
    GX = (2 * D + 2) // 8
    m = ptab_ref[s_id * K + k_id]

    @pl.when((k_id == 0) & (j == 0) & (g == 0))
    def _():
        gout_ref[...] = jnp.zeros_like(gout_ref)

    gx0 = gx0_ref[m, j]
    gx1 = gx1_ref[m, j]

    @pl.when((g >= gy0_ref[m, j]) & (g <= gy1_ref[m, j]))
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


def _pair_table(src_idx: tuple, S: int):
    """(src (M,), ptab (S*K,)): pairs of each source, source-grouped."""
    src = np.asarray(src_idx, np.int32)
    M = src.shape[0]
    counts = np.bincount(src, minlength=S)
    assert counts.min() == counts.max(), (
        "warp2d_pairs needs every source plane in the same number of pairs "
        f"(got counts {counts})")
    K = int(counts[0])
    assert S * K == M
    ptab = np.concatenate([np.nonzero(src == s)[0] for s in range(S)])
    return src, ptab.astype(np.int32), K


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp2d_pairs(feat, flow, src_idx: tuple, max_shift: int = 16):
    """out[m] = warp(feat[src_idx[m]], flow[m]) — bilinear, zeros padding.

    feat (S, H, W, C) f32/bf16; flow (M, H, W, 2); src_idx a static tuple of
    M ints with every source appearing equally often.  Returns (M, H, W, C)
    in feat's dtype.  Gradient flows to feat only.
    """
    out, _ = _pairs_fwd(feat, flow, src_idx, max_shift)
    return out


def _pairs_fwd(feat, flow, src_idx, max_shift):
    D = _effective_shift(max_shift)
    S, H, W, C = feat.shape
    M = flow.shape[0]
    dtype = feat.dtype
    BH, n_bands, G, wp = _v2_dims(H, W, D)
    src, _, _ = _pair_table(src_idx, S)

    kx, ky, fx, fy = _warp2d_prep(flow[..., 0], flow.astype(jnp.float32), D)
    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    C_blk = _pick_cblk_fwd(C, BH, W, G)

    img_chw = jnp.moveaxis(feat, -1, 1)                      # (S, C, H, W)
    img_pad = jnp.pad(img_chw, ((0, 0), (0, 0), (D, 8 * G - D),
                                (D, wp - W - D)))

    kernel = partial(_fwd_kernel, BH=BH, W=W, D=D, C_blk=C_blk, WP=wp,
                     dtype=dtype)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)
    blk = lambda: pl.BlockSpec((1, 1, BH, W),
                               lambda i, j, c, g, *_: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
    )(jnp.asarray(src), gy0, gy1, gx0, gx1,
      img_pad, shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx))
    out = jnp.moveaxis(out.reshape(M, n_bands, C, BH, W), 2, 1)
    out = out.reshape(M, C, H, W).astype(dtype)
    return jnp.moveaxis(out, 1, -1), (flow, S, H, W, C)


def _pairs_bwd(src_idx, max_shift, res, g):
    D = _effective_shift(max_shift)
    flow, S, H, W, C = res
    M = g.shape[0]
    BH, n_bands, G, wp = _v2_dims(H, W, D)
    src, ptab, K = _pair_table(src_idx, S)

    kx, ky, fx, fy = _warp2d_prep(flow[..., 0], flow.astype(jnp.float32), D)
    gy0, gy1, gx0, gx1 = _warp2d_ranges(ky, kx, n_bands, BH, D)
    C_blk = _pick_cblk(C, BH, W, G)
    Hp = H + 8 * G

    g_chw = jnp.moveaxis(g, -1, 1)                           # (M, C, H, W)
    g_b = g_chw.reshape(M, C, n_bands, BH, W)

    kernel = partial(_bwd_kernel, BH=BH, W=W, D=D, C_blk=C_blk, K=K)
    shape4 = lambda a: a.reshape(M, n_bands, BH, W)

    def tap_map(s, c, k, j, g_, ptab_ref, *_):
        return (ptab_ref[s * K + k], j, 0, 0)

    blk = lambda: pl.BlockSpec((1, 1, BH, W), tap_map,
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S, C // C_blk, K, n_bands, G),
        in_specs=[
            blk(), blk(), blk(), blk(),
            pl.BlockSpec((1, C_blk, 1, BH, W),
                         lambda s, c, k, j, g_, ptab_ref, *_:
                         (ptab_ref[s * K + k], c, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C_blk, Hp, wp),
                               lambda s, c, k, j, g_, *_: (s, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C_blk, BH + 8, wp), jnp.float32)],
    )
    grad_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, C, Hp, wp), jnp.float32),
    )(jnp.asarray(ptab), gy0, gy1, gx0, gx1,
      shape4(ky), shape4(kx), shape4(1.0 - fy), shape4(1.0 - fx), g_b)
    grad_feat = grad_pad[:, :, D:D + H, D:D + W].astype(g.dtype)
    return jnp.moveaxis(grad_feat, 1, -1), jnp.zeros_like(flow)


warp2d_pairs.defvjp(
    lambda feat, flow, si, ms: _pairs_fwd(feat, flow, si, ms), _pairs_bwd)
