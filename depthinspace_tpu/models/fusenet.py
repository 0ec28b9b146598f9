"""DIS-MF multi-frame fusion network (FuseNet).

Re-design of the reference ``FuseNet`` / ``Block2D3D`` / ``Conv3D``
(reference model/multi_frame_networks.py:101-541) as Flax modules in NHWC
layout. The network fuses the 4 frames of a track: it encodes each frame at
half resolution ("core"), unprojects the primary depth to per-frame 3D point
clouds, flow-warps the other frames' points/features into each target view,
and runs N fusion blocks that mix 2D convolutions with a continuous
k-nearest-neighbor convolution over the warped 3D points, before decoding a
refined full-resolution disparity.

TPU-first redesign choices
--------------------------
- The reference's Python loops over target frames (model/multi_frame_
  networks.py:287-297,381-404) become ``vmap`` over a precomputed source-order
  index table (self first, then the other frames ascending — position 0 must
  be the target frame because the point-conv picks its center reference from
  stack position 0, reference model/multi_frame_networks.py:491-493).
- ``Conv3D``'s unfold/topk/gather (reference :469-511) is expressed with
  static strided slices + ``lax.top_k`` + ``take_along_axis`` — all static
  shapes (9 neighbors from the 3x3 x tl = 36 candidates).
- ``torch.utils.checkpoint`` on the fusion blocks (reference :365-371)
  becomes ``nn.remat`` on Block2D3D and the decoder ResNet chain.
- The half-resolution ray grid replicates the reference's cv2 INTER_NEAREST
  subsampling (even pixel indices, reference :121-128).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sampling import resize_bilinear, resize_flow
from ..ops.resample import flow_warp as warp
from ..ops.resample import flow_warp_pairs
from .dispnet import SigmoidAffineHead
from .packed import (PackedConv, PackedGroupNorm, PackedResNetBlock,
                     pack_frames, unpack_frames, pack_concat)


def _selu_conv(features, kernel, stride=1, name=None):
    """ZeroPad + Conv + SELU (reference FuseNet.conv, :159-164)."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="SAME", name=name)


class ResNetBlock(nn.Module):
    """conv-SELU-GN x2 + identity (reference model/multi_frame_networks.py:514-541)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt)(x)
        y = nn.selu(y)
        y = nn.GroupNorm(num_groups=1, dtype=dt)(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt)(y)
        y = nn.GroupNorm(num_groups=1, dtype=dt)(y)
        return nn.selu(y + x)


def source_order(track_length: int) -> np.ndarray:
    """ORDER[i] = [i, frames != i in ascending order]; stack position 0 is the
    target frame itself (reference gather_warped_xyz/feat,
    model/multi_frame_networks.py:187-214,347-360)."""
    order = []
    for i in range(track_length):
        order.append([i] + [j for j in range(track_length) if j != i])
    return np.asarray(order, np.int32)


def _extract_patches(x: jax.Array, ksize: int, stride: int) -> jax.Array:
    """x: (..., h, w, C) -> (..., h', w', ksize*ksize, C), zero padding
    (matches the reference's constant-0 pad, model/multi_frame_networks.py:
    472-474).

    Lowered as an identity-kernel convolution
    (``lax.conv_general_dilated_patches``): a stack of strided slices looks
    equivalent but XLA lowers the stride-2 variant to serialized kCustom
    gather fusions (~10.7 ms each at (16,256,216,32) — 36 of them cost
    ~380 ms/step); the conv form is dense window work with a conv-transpose
    backward.  Values are bit-exact either way (0/1 kernel) — but only at
    the right precision: the TPU's DEFAULT conv path truncates f32 operands
    to bf16, which perturbs the f32 xyz patches enough to flip near-tie
    neighbor selections; HIGHEST (3-pass f32 emulation) is exact, and for
    bf16 features DEFAULT already passes values through unchanged."""
    p = (ksize - 1) // 2
    *lead, h, w, c = x.shape
    flat = x.reshape(-1, h, w, c)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jax.lax.conv_general_dilated_patches(
        flat, (ksize, ksize), (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    ho, wo = out.shape[1:3]
    # patch channels come out c-major (c*ksize^2 + tap_raster)
    out = out.reshape(*lead, ho, wo, c, ksize * ksize)
    return jnp.moveaxis(out, -2, -1)


def _merged_patches(v, ksize, stride):
    """(tl, N, h, w, C) -> (N, h', w', k2*tl, C): 3x3 spatial offsets x tl
    source frames merged frame-major (s = j*k2 + k)."""
    p = _extract_patches(v, ksize, stride)
    p = jnp.moveaxis(p, 0, -3)                # (N, h', w', k2, tl, C)
    return p.reshape(*p.shape[:3], p.shape[-3] * p.shape[-2], p.shape[-1])


def pointconv_select(xyz, mask, neighbors=9, ksize=3, stride=1):
    """Candidate selection for :class:`PointConv`.

    For every output location, gather the 3x3 x tl spatio-temporal candidate
    points and pick the ``neighbors`` nearest in normalized image-plane
    distance (masked candidates pushed past the global max).

    The selection depends only on the warped geometry (xyz, mask) — which is
    ``stop_gradient``-fixed for the whole forward pass — so FuseNet computes
    it ONCE per scale and shares it across all fusion blocks (the reference
    re-runs unfold/topk inside every block, model/multi_frame_networks.py:
    469-511; hoisting is bit-identical and removes ~3/4 of the sort work
    plus all of its remat recomputation).

    xyz: (tl, N, h, w, 3) in the target camera frame (stack position 0 =
    target); mask: (tl, N, h, w, 1).  Selection runs in f32 — bf16 distance
    ties would reorder neighbors.

    Returns (idx, xyz_nb): idx (N, h', w', k) int32 indices into the merged
    frame-major candidate axis; xyz_nb (N, h', w', k, 3) f32 center-relative
    xyz of the selected neighbors.
    """
    tl = xyz.shape[0]
    k2 = ksize * ksize

    xyz_p = _merged_patches(xyz, ksize, stride)
    mask_p = _merged_patches(mask, ksize, stride)

    # normalized image-plane coordinates (x/z, y/z, 1)
    xyz_plane = xyz_p / (xyz_p[..., 2:] + 1e-12)
    # The center reference = target frame (stack position j=0, reference
    # model/multi_frame_networks.py:491-493) at the central 3x3 offset.
    center = k2 // 2
    xyz_local = xyz_p - xyz_p[..., center:center + 1, :]
    plane_local = xyz_plane - xyz_plane[..., center:center + 1, :]
    dist = jnp.sum(plane_local * plane_local, axis=-1)      # (N,h',w',k2*tl)

    # push masked-out candidates beyond the global max so top_k skips them
    m = mask_p[..., 0].astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    dist_masked = m * dist + (1.0 - m) * (jnp.max(dist) + 1.0)
    _, idx = jax.lax.top_k(-dist_masked, neighbors)         # k smallest

    onehot = jax.nn.one_hot(idx, k2 * tl, dtype=jnp.float32)
    xyz_nb = jnp.einsum("nhwks,nhwsc->nhwkc", onehot,
                        xyz_local.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return idx, xyz_nb


class PointConv(nn.Module):
    """Continuous kNN convolution over warped 3D point clouds.

    Redesign of the reference ``Conv3D`` (model/multi_frame_networks.py:
    432-512): with the neighbor selection precomputed by
    :func:`pointconv_select`, run an MLP on the relative xyz to produce
    per-neighbor weights and take the weighted feature sum through a linear
    map + SELU + GroupNorm.
    """
    features: int
    neighbors: int = 9
    ksize: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, idx, xyz_nb):
        """feat: (tl, N, h, w, C) (stack position 0 = target); idx/xyz_nb
        from :func:`pointconv_select` at the matching ksize/stride.
        Returns (N, h', w', features)."""
        tl = feat.shape[0]
        k2 = self.ksize * self.ksize
        dt = self.dtype

        feat_p = _merged_patches(feat, self.ksize, self.stride)

        # neighbor gather as a one-hot contraction over the 36 candidates:
        # per-pixel take_along_axis gathers lower to the pathologically slow
        # flat dynamic-gather fusion on this TPU stack, while the (9,36)x
        # (36,C) einsum is dense VPU/MXU work with einsum gradients
        # precision: the contraction is an exact 0/1 selection. In f32 the
        # HIGHEST (non-bf16-split) matmul keeps it bit-exact vs a gather
        # oracle; in bf16 compute the selected values get truncated to bf16
        # anyway (the weight MLP below runs in bf16), so the single-pass
        # DEFAULT matmul is used — HIGHEST on bf16 operands would trigger
        # the multi-pass f32-emulation for nothing.
        sel_prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
                    else jax.lax.Precision.DEFAULT)
        onehot = jax.nn.one_hot(idx, k2 * tl, dtype=dt)
        feat_nb = jnp.einsum("nhwks,nhwsc->nhwkc", onehot,
                             feat_p.astype(dt),
                             preferred_element_type=dt,
                             precision=sel_prec)

        wgt = nn.selu(nn.Dense(self.features // 2, dtype=dt)(xyz_nb.astype(dt)))
        wgt = nn.selu(nn.Dense(self.features, dtype=dt)(wgt))   # (N,h',w',9,F)

        feat_weighted = jnp.sum(wgt * feat_nb, axis=-2)         # (N, h', w', F)
        out = nn.Dense(self.features, use_bias=False, dtype=dt,
                       kernel_init=nn.initializers.xavier_uniform())(feat_weighted)
        out = nn.selu(out)
        return nn.GroupNorm(num_groups=1, dtype=dt)(out)


class Block2D3D(nn.Module):
    """One fusion block: flow-warped multi-frame 2D merge at two scales +
    two point convolutions, fused with a residual SELU
    (reference model/multi_frame_networks.py:307-430).

    ``packed=True`` runs the 2D branch frame-packed (models/packed.py):
    identical math and parameter tree, ~3x faster convs on v5e (C=128
    grouped vs C=32 frame-major)."""
    features: int
    track_length: int
    dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, feat, flow, flow_half, sel1, sel2, merge_w):
        """feat: (tl, N, h, w, C); flow: (tl, tl, N, h, w, 2); flow_half:
        same at (h/2, w/2); sel1/sel2: per-target (idx, xyz_nb) pairs from
        :func:`pointconv_select` at stride 2 (full-res candidates) and
        stride 1 (half-res); merge_w: (tl_t, tl_s, N, h, w, 1) mask-merge
        weights for the 2D branch.  All of these are identical across the
        fusion blocks and precomputed once by FuseNet."""
        tl = self.track_length
        dt = self.dtype
        order = source_order(tl)

        def gather_warped_feat(f, fl):
            # For each target i: stack [f[i]] + [warp(f[j], fl[i, j]) for
            # j != i].  All tl*(tl-1) warps run as ONE batched Pallas call
            # (identical math — warp2d is independent per batch image; the
            # band-sparsity ranges are computed per image either way) so the
            # launch overhead and grid pipelining amortize across pairs.
            # By default flow_warp_pairs MATERIALIZES the pair-major source
            # stack (static-slice restack, tl-1 copies per fusion block)
            # before the kernel; the in-kernel source gather that avoids
            # that HBM traffic exists (ops/pallas/warp2d_pairs.py) but is
            # opt-in via DIS_WARP_PAIRS=1 until its on-hardware win is
            # confirmed (scripts/bench_warp_pairs.py).
            N = f.shape[1]
            flows = jnp.stack([fl[i, j] for i in range(tl)
                               for j in order[i][1:]], axis=0)
            P = tl * (tl - 1)
            src_idx = tuple(j * N + n for i in range(tl)
                            for j in order[i][1:] for n in range(N))
            w = flow_warp_pairs(f.reshape(tl * N, *f.shape[2:]),
                                flows.reshape(P * N, *flows.shape[2:]),
                                src_idx)
            w = w.reshape(tl, tl - 1, N, *f.shape[2:])
            return jnp.concatenate([f[:, None], w], axis=1)

        # --- point-conv branch ------------------------------------------
        warped_feat = gather_warped_feat(feat, flow)   # (tl_t, tl_s, N, h, w, C)

        # vmap the point conv over the target-frame axis (shared params)
        Pc1 = nn.vmap(PointConv, in_axes=(0, 0, 0), out_axes=0,
                      variable_axes={"params": None}, split_rngs={"params": False})
        out3d_1 = Pc1(self.features, stride=2, dtype=dt, name="conv3d_1")(
            warped_feat, *sel1)                            # (tl, N, h/2, w/2, C)

        # second point conv at the coarser scale
        h2, w2 = out3d_1.shape[2], out3d_1.shape[3]
        warped_feat2 = gather_warped_feat(out3d_1, flow_half)
        Pc2 = nn.vmap(PointConv, in_axes=(0, 0, 0), out_axes=0,
                      variable_axes={"params": None}, split_rngs={"params": False})
        out3d_2 = Pc2(self.features, stride=1, dtype=dt, name="conv3d_2")(
            warped_feat2, *sel2)                           # (tl, N, h/2, w/2, C)

        # --- 2D branch ---------------------------------------------------
        # mask-weighted merge of the warped feature stack
        # (reference fwd_2d, :406-430)
        wf = warped_feat * merge_w.astype(warped_feat.dtype)
        tl_t, tl_s, N, h, w, C = wf.shape

        if self.packed:
            # frame-packed: target frames -> channel groups (models/packed.py)
            G = tl_t
            F = self.features
            wf = jnp.transpose(wf, (2, 3, 4, 0, 1, 5))      # (N,h,w,tt,ts,C)
            wf = wf.reshape(N, h, w, tl_t * tl_s * C)
            mf = PackedConv(F, (1, 1), G, dtype=dt, name="conv_mf")(wf)
            mf = PackedGroupNorm(G, dtype=dt, name="GroupNorm_0")(mf)

            b1 = PackedGroupNorm(G, dtype=dt, name="GroupNorm_1")(nn.selu(
                PackedConv(F, (3, 3), G, dtype=dt, name="Conv_0")(mf)))
            b1 = PackedGroupNorm(G, dtype=dt, name="GroupNorm_2")(nn.selu(
                PackedConv(F, (3, 3), G, dtype=dt, name="Conv_1")(b1)))

            b2 = PackedGroupNorm(G, dtype=dt, name="GroupNorm_3")(nn.selu(
                PackedConv(F, (4, 4), G, strides=(2, 2), dtype=dt,
                           name="Conv_2")(mf)))
            b2 = PackedGroupNorm(G, dtype=dt, name="GroupNorm_4")(nn.selu(
                PackedConv(F, (3, 3), G, dtype=dt, name="Conv_3")(b2)))
            b2 = resize_bilinear(b2, h, w, align_corners=True)

            o3 = pack_frames(out3d_2.reshape(tl_t * N, h2, w2, C), tl_t)
            o3 = resize_bilinear(o3, h, w, align_corners=True)

            fuse = pack_concat([b1, b2, o3], tl_t)
            fuse = PackedConv(F, (3, 3), G, dtype=dt, name="conv_fuse")(fuse)
            fuse = PackedGroupNorm(G, dtype=dt, name="GroupNorm_5")(fuse)

            feat_packed = pack_frames(feat.reshape(tl_t * N, h, w, C), tl_t)
            out = nn.selu(fuse + feat_packed)
            out = unpack_frames(out, tl_t).reshape(tl_t, N, h, w, C)
            return out

        wf = jnp.moveaxis(wf, 1, -2).reshape(tl_t * N, h, w, tl_s * C)

        mf = nn.Conv(self.features, (1, 1), dtype=dt, name="conv_mf")(wf)
        mf = nn.GroupNorm(num_groups=1, dtype=dt)(mf)

        b1 = nn.GroupNorm(num_groups=1, dtype=dt)(nn.selu(
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt)(mf)))
        b1 = nn.GroupNorm(num_groups=1, dtype=dt)(nn.selu(
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt)(b1)))

        b2 = nn.GroupNorm(num_groups=1, dtype=dt)(nn.selu(
            nn.Conv(self.features, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=dt)(mf)))
        b2 = nn.GroupNorm(num_groups=1, dtype=dt)(nn.selu(
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt)(b2)))
        b2 = resize_bilinear(b2, h, w, align_corners=True)

        o3 = out3d_2.reshape(tl_t * N, h2, w2, C)
        o3 = resize_bilinear(o3, h, w, align_corners=True)

        fuse = jnp.concatenate([b1, b2, o3], axis=-1)
        fuse = nn.Conv(self.features, (3, 3), padding="SAME", dtype=dt,
                       name="conv_fuse")(fuse)
        fuse = nn.GroupNorm(num_groups=1, dtype=dt)(fuse)

        out = nn.selu(fuse.reshape(tl_t, N, h, w, C) + feat)
        return out


def _resize_leading(x, h, w):
    """Resize (..., h0, w0, C) -> (..., h, w, C) bilinear align_corners=True."""
    lead = x.shape[:-3]
    flat = x.reshape(-1, *x.shape[-3:])
    out = resize_bilinear(flat, h, w, align_corners=True)
    return out.reshape(*lead, h, w, x.shape[-1])


def _resize_flow_grid(flow, h, w):
    """Resize a (tl, tl, N, h0, w0, 2) flow field, rescaling values."""
    tl0, tl1, N = flow.shape[:3]
    flat = flow.reshape(tl0 * tl1 * N, *flow.shape[3:])
    out = resize_flow(flat, h, w)
    return out.reshape(tl0, tl1, N, h, w, 2)


class FuseNet(nn.Module):
    """Multi-frame fusion network (reference model/multi_frame_networks.py:
    101-305). Input/output shapes are track-major NHWC.

    __call__(ir, amb, primary_disp, primary_depth, R, t, flow):
      ir:   (tl, N, H, W, 2)  [LCN(IR), IR]
      amb:  (tl, N, H, W, 1)
      primary_disp/primary_depth: (tl, N, H, W, 1)
      R: (tl, N, 3, 3); t: (tl, N, 3)
      flow: (tl, tl, N, H, W, 2)
    Returns disparity (tl, N, H, W, 1).
    """
    imsize: tuple[int, int]
    K: tuple[tuple[float, ...], ...]     # 3x3 intrinsics (hashable)
    track_length: int = 4
    block_num: int = 4
    channels: int = 32
    max_disp: float = 128.0
    use_remat: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    # frame-packed execution (models/packed.py): identical math + parameter
    # tree, frames folded into channels so the 2D convs run at C=128 (72%
    # MXU on v5e) instead of C=32 (5.5%).  Checkpoints interchange freely
    # (equivalence: tests/test_packed.py).
    packed: bool = True

    def _core_ray(self):
        """Half-res ray grid at even pixel indices (reference :121-128 uses
        cv2 INTER_NEAREST subsampling of the full-res meshgrid)."""
        H, W = self.imsize
        ch, cw = H // 2, W // 2
        Ki = np.linalg.inv(np.asarray(self.K, np.float64))
        u = (np.arange(cw) * (W / cw)).astype(np.int64)   # cv2 nearest: floor
        v = (np.arange(ch) * (H / ch)).astype(np.int64)
        uu, vv = np.meshgrid(u, v)
        uv1 = np.stack([uu, vv, np.ones_like(uu)], axis=-1).reshape(-1, 3)
        ray = (uv1 @ Ki.T).astype(np.float32)             # (ch*cw, 3)
        return jnp.asarray(ray), ch, cw

    @nn.compact
    def __call__(self, ir, amb, primary_disp, primary_depth, R, t, flow):
        tl, N, H, W, _ = ir.shape
        C = self.channels
        dt = self.compute_dtype
        ray, ch, cw = self._core_ray()

        # ---------------- encoder (pre_process, reference :216-227) -------
        x = jnp.concatenate([ir, amb, primary_disp], axis=-1)
        x = x.reshape(tl * N, H, W, 4).astype(dt)
        if self.packed:
            x = pack_frames(x, tl)                    # (N, H, W, tl*4)
            x = nn.selu(PackedConv(C // 2, (4, 4), tl, strides=(2, 2),
                                   dtype=dt, name="conv1")(x))
            x = nn.selu(PackedConv(C // 2, (3, 3), tl, dtype=dt,
                                   name="conv2")(x))
            x = nn.selu(PackedConv(C, (3, 3), tl, dtype=dt, name="conv3")(x))
            x = nn.selu(PackedConv(C, (3, 3), tl, dtype=dt, name="conv4")(x))
            x = PackedResNetBlock(C, tl, dtype=dt, name="res1")(x)
            x = PackedResNetBlock(C, tl, dtype=dt, name="res2")(x)
            feat = PackedResNetBlock(C, tl, dtype=dt, name="res3")(x)
            core_feat = unpack_frames(feat, tl).reshape(tl, N, ch, cw, C)
        else:
            x = nn.selu(nn.Conv(C // 2, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=dt, name="conv1")(x))
            x = nn.selu(nn.Conv(C // 2, (3, 3), padding="SAME", dtype=dt,
                                name="conv2")(x))
            x = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt,
                                name="conv3")(x))
            x = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt,
                                name="conv4")(x))
            x = ResNetBlock(C, dtype=dt, name="res1")(x)
            x = ResNetBlock(C, dtype=dt, name="res2")(x)
            feat = ResNetBlock(C, dtype=dt, name="res3")(x)
            core_feat = feat.reshape(tl, N, ch, cw, C)

        # ---------------- geometry: core xyz per frame --------------------
        core_depth = _resize_leading(primary_depth, ch, cw)   # (tl,N,ch,cw,1)
        core_flow = _resize_flow_grid(flow, ch, cw)
        core_amb = _resize_leading(amb, ch, cw)
        del core_amb  # parity: loaded but unused by the reference forward

        # unproject: xyz_world = (depth*ray - t) @ R (reference :172-179)
        d = core_depth.reshape(tl, N, ch * cw, 1)
        xyz = d * ray[None, None]
        xyz = xyz - t[:, :, None, :]
        xyz = jnp.einsum("lnpi,lnij->lnpj", xyz, R)

        # change into each target frame's camera: xyz @ R_i^T + t_i
        # (reference change_view_angle, :181-185)
        xyz_t = jnp.einsum("snpj,tnij->tsnpi", xyz, R)        # (tl_t, tl_s, ...)
        xyz_t = xyz_t + t[:, None, :, None, :]
        xyz_t = xyz_t.reshape(tl, tl, N, ch, cw, 3)

        order = source_order(tl)
        # warped xyz + forward-backward masks per target
        # (reference gather_warped_xyz, :187-214; note the 0.01 factor here
        # vs 0.02 in the losses).  The tl*(tl-1) source warps run as ONE
        # batched Pallas call; the xyz channels (3) and the reverse flow
        # needed for the fb round-trip check (2) share it via channel concat.
        P = tl * (tl - 1)
        pairs = [(i, j) for i in range(tl) for j in order[i][1:]]
        src = jnp.stack([jnp.concatenate(
            [xyz_t[i, j], core_flow[j, i]], axis=-1) for i, j in pairs], 0)
        fwd_flow = jnp.stack([core_flow[i, j] for i, j in pairs], 0)
        warped = warp(src.reshape(P * N, ch, cw, 5),
                      fwd_flow.reshape(P * N, ch, cw, 2))
        warped = warped.reshape(tl, tl - 1, N, ch, cw, 5)
        wxyz = warped[..., :3]
        f10 = warped[..., 3:]
        f0 = fwd_flow.reshape(tl, tl - 1, N, ch, cw, 2)
        fb = (jnp.sum((f0 + f10) ** 2, -1)
              < 0.5 + 0.01 * (jnp.sum(f0 ** 2, -1) + jnp.sum(f10 ** 2, -1)))
        # stack position 0 is the target frame itself (identity, mask 1)
        self_xyz = jnp.stack([xyz_t[i, i] for i in range(tl)], 0)[:, None]
        warped_xyz = jnp.concatenate([self_xyz, wxyz], axis=1)
        warped_mask = jnp.concatenate(
            [jnp.ones((tl, 1, N, ch, cw, 1), xyz_t.dtype),
             fb.astype(xyz_t.dtype)[..., None]], axis=1)
        warped_xyz = jax.lax.stop_gradient(warped_xyz)
        warped_mask = jax.lax.stop_gradient(warped_mask)

        # ---------------- fusion blocks -----------------------------------
        # Everything that depends only on the (stop-gradient) warped geometry
        # is identical across the blocks — compute it once here instead of
        # inside every block (and every remat recompute): the point-conv
        # neighbor selections at both scales, the half-res flow grid, and the
        # 2D-branch mask-merge weights.
        sel1 = jax.vmap(lambda x, m: pointconv_select(x, m, stride=2))(
            warped_xyz, warped_mask)
        h2, w2 = ch // 2, cw // 2
        flow_half = _resize_flow_grid(core_flow, h2, w2)
        xyz_half = _resize_leading(warped_xyz, h2, w2)
        mask_half = (_resize_leading(warped_mask, h2, w2) > 0.5).astype(
            warped_mask.dtype)
        sel2 = jax.vmap(lambda x, m: pointconv_select(x, m, stride=1))(
            xyz_half, mask_half)
        merge_w = warped_mask / jnp.mean(warped_mask, axis=1, keepdims=True)

        block_cls = Block2D3D
        if self.use_remat:
            block_cls = nn.remat(Block2D3D, static_argnums=())
        for b in range(self.block_num):
            core_feat = block_cls(C, self.track_length, dtype=dt,
                                  packed=self.packed,
                                  name=f"block{b}")(core_feat, core_flow,
                                                    flow_half, sel1, sel2,
                                                    merge_w)

        # ---------------- decoder (post_process, reference :229-267) ------
        if self.packed:
            feat = pack_frames(core_feat.reshape(tl * N, ch, cw, C), tl)
            up = resize_bilinear(feat, H, W, align_corners=True)

            a = pack_frames(amb.reshape(tl * N, H, W, 1).astype(dt), tl)
            a = nn.selu(PackedConv(16, (3, 3), tl, dtype=dt,
                                   name="amb_conv")(a))
            amb_block = (nn.remat(PackedResNetBlock) if self.use_remat
                         else PackedResNetBlock)
            a = amb_block(16, tl, dtype=dt, name="amb_res1")(a)
            a = amb_block(16, tl, dtype=dt, name="amb_res2")(a)

            y = pack_concat([up, a], tl)
            y = nn.selu(PackedConv(32, (3, 3), tl, dtype=dt,
                                   name="ref_conv")(y))
            ref_block = (nn.remat(PackedResNetBlock) if self.use_remat
                         else PackedResNetBlock)
            y = ref_block(32, tl, dtype=dt, name="ref_res1")(y)
            y = ref_block(32, tl, dtype=dt, name="ref_res2")(y)
            y = ref_block(32, tl, dtype=dt, name="ref_res3")(y)
            y = nn.selu(PackedConv(16, (3, 3), tl, dtype=dt,
                                   name="final_conv")(y))
            y = unpack_frames(y, tl)
        else:
            feat = core_feat.reshape(tl * N, ch, cw, C)
            up = resize_bilinear(feat, H, W, align_corners=True)

            a = amb.reshape(tl * N, H, W, 1).astype(dt)
            a = nn.selu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt,
                                name="amb_conv")(a))
            amb_block = (nn.remat(ResNetBlock) if self.use_remat
                         else ResNetBlock)
            a = amb_block(16, dtype=dt, name="amb_res1")(a)
            a = amb_block(16, dtype=dt, name="amb_res2")(a)

            y = jnp.concatenate([up, a], axis=-1)
            y = nn.selu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                name="ref_conv")(y))
            ref_block = (nn.remat(ResNetBlock) if self.use_remat
                         else ResNetBlock)
            y = ref_block(32, dtype=dt, name="ref_res1")(y)
            y = ref_block(32, dtype=dt, name="ref_res2")(y)
            y = ref_block(32, dtype=dt, name="ref_res3")(y)
            y = nn.selu(nn.Conv(16, (3, 3), padding="SAME", dtype=dt,
                                name="final_conv")(y))

        disp = SigmoidAffineHead(self.max_disp, name="predict_disp")(
            y.astype(jnp.float32))
        return disp.reshape(tl, N, H, W, 1)
