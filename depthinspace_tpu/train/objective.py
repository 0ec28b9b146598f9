"""Total training objectives for DIS-SF / DIS-FTSF / DIS-MF.

Assembles the loss stacks of the reference workers as pure functions that
run *inside* the jitted train step (LCN preprocessing included — the
reference did LCN eagerly per batch, model/worker.py:430-445):

DIS-SF (reference single_frame_worker.py:101-165):
  sum_s photometric(out_s) / 2^s
  + 0.4 * smoothness(out_0)
  + (0.2 / C(tl,2)) * sum_pairs sf_flow_consistency(depth(out_0))
  + [use_pseudo_gt] 0.1 * sum_s L1(out_s, pseudo_gt) / 2^s
  + [real, epoch < warmup] 0.1 * sum_s masked-noisy-L1(out_s, sgm_disp)

DIS-MF (reference multi_frame_worker.py:103-175):
  photometric(out) + 0.8 * smoothness(out)
  + (0.2 / C(tl,2)) * sum_pairs mf_flow_consistency(depth(out))
  + [epoch < 2] 0.1 * L1(out, primary_disp)
  + [real, epoch < warmup] 0.1 * masked-noisy-L1(out, sgm_disp)

Epoch-dependent warmup terms are expressed with ``jnp.where`` gates so a
single compiled graph covers all epochs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lcn, disp_to_depth
from ..losses import (CameraGeometry, photometric_loss, smoothness_loss,
                      geometric_loss_sf, geometric_loss_mf)


class LossContext(NamedTuple):
    """Static per-run loss configuration + precomputed constants."""
    cam: CameraGeometry
    pattern_lcn: jax.Array           # (H, W) LCN-normalized pattern
    focal_length: float
    baseline: float
    track_length: int
    data_type: str = "synthetic"
    warmup_epochs: int = 150
    use_pseudo_gt: bool = False
    lcn_radius: int = 5
    smooth_weight_sf: float = 0.4
    smooth_weight_mf: float = 0.8
    geo_weight: float = 0.2
    pseudo_weight: float = 0.1
    sgm_weight: float = 0.1
    mf_primary_warmup_weight: float = 0.1
    mf_primary_warmup_epochs: int = 2
    sgm_noise_sigma: float = 1.5
    sgm_valid_threshold: float = 30.0
    geo_clamp: float = 0.1
    geo_max_shift: int = 16
    # device-side augmentation (train only; the max_shift=0 menu of the
    # reference's CPU augmentation, reference data/data_manipulation.py:
    # 114-195 — this host has a single CPU core, so per-frame cv2/numpy
    # augmentation starves the chip; on-device it is ~free)
    augment: bool = False
    aug_max_blur: float = 0.5
    aug_max_noise: float = 3.0
    aug_max_sp_noise: float = 0.0005
    # "file": flow comes from flow.hdf5 via the loader (any provider);
    # "rigid": computed in-graph from GT disparity + poses — exact on
    # static synthetic scenes and removes the largest host->device
    # transfer (the (tl,tl,H,W,2) flow block is ~60% of batch bytes);
    # "net": computed in-graph by the frozen learned FlowNet
    # (models/flownet.py::flow_all_pairs) — the GT-free provider fused
    # into the step (replaces the presave_flow stage + flow transfer);
    # "pred": computed in-graph from PREDICTED disparity + poses (MF:
    # primary_disp, SF: the current stop-gradient prediction) — GT-free
    # like "net", but exact up to the disparity error on static scenes.
    # On this synthetic imagery image-based flow is near-ill-posed (the
    # IR dots are projected from the moving rig so they do NOT follow
    # scene correspondences, and the procedural ambient is textureless:
    # measured val EPE — zero-flow 12.5, Farneback 12.55, learned 12.5),
    # while "pred" flow error tracks the few-px disparity error.  The
    # poses R/t are legitimate inputs: FuseNet itself consumes them
    # (reference model/multi_frame_networks.py:172-185).
    flow_source: str = "file"
    # frozen FlowNet params for flow_source="net" (threaded through jit as
    # arguments like the other array constants)
    flow_params: Optional[object] = None
    flow_in_channels: int = 2
    # Photometric pyramid (SF): compute the scale-s photometric term at
    # 1/2^s resolution (disparity values rescaled, per-scale LCN'd image +
    # pattern) instead of full resolution.  The 9x9 census basin is ~±4 px,
    # so full-res terms at every scale (what the reference's worker ends up
    # doing — it builds per-scale ph_losses at per-scale imsizes,
    # single_frame_worker.py:62-71, then indexes ph_losses[0] for ALL
    # scales, :115) leave any pixel >4 px from its target without
    # photometric gradient; evaluating scale s at 1/2^s res widens capture
    # to ±4*2^s px (the CTD-style coarse-to-fine the per-scale loss list
    # was built for).
    photometric_pyramid: bool = False
    # per-scale LCN'd patterns for scales 1..3 (filled by make_loss_context
    # when photometric_pyramid; threaded through jit as arguments)
    pattern_pyr: Optional[tuple] = None


def make_loss_context(settings, track_length=4, **kwargs) -> LossContext:
    from ..ops.sampling import resize_bilinear

    H, W = settings.imsize
    cam = CameraGeometry.create(settings.K, H, W)
    radius = kwargs.get("lcn_radius", 5)
    pat_raw = jnp.asarray(settings.pattern_gray())
    pat_lcn, _ = lcn(pat_raw, radius, 0.05)
    pattern_pyr = None
    if kwargs.get("photometric_pyramid", False):
        # per-scale patterns: downsample the RAW pattern, then LCN — the
        # reference's per-scale construction order (its dataset pyramid is
        # resized raw images, LCN applied after; single_frame_worker.py:62-67)
        pyr = []
        for s in (1, 2, 3):
            p_s = resize_bilinear(pat_raw[None, :, :, None], H >> s, W >> s,
                                  align_corners=False)[0, :, :, 0]
            pyr.append(lcn(p_s, radius, 0.05)[0])
        pattern_pyr = tuple(pyr)
    return LossContext(cam=cam, pattern_lcn=pat_lcn, pattern_pyr=pattern_pyr,
                       focal_length=settings.focal_length,
                       baseline=settings.baseline,
                       track_length=track_length, **kwargs)


def rigid_flow_device(cam, disp_gt, R, t, focal_length, baseline):
    """All-pairs rigid optical flow from GT disparity + poses, in-graph.

    Identical math to the offline rigid provider (tools/presave_flow.py::
    rigid_flow, itself the reprojection of ops/geometry.py): unproject each
    frame's depth to world, project into every other frame, subtract the
    pixel grid. Returns (tl, tl, bs, H, W, 2) with a zero diagonal — the
    exact layout the datasets collate from flow.hdf5.

    TPU layout note: the computation runs on SEPARATE x/y/z coordinate
    planes of shape (..., H, W) instead of (..., P, 3) tensors — a
    3-extent minor dim occupies 3 of the 128 lanes of a TPU tile, so the
    (..., P, 3) einsum intermediates invite padded layouts; the planes
    keep everything on the natural (8, 128) image tiling.  (Measured step
    time is dominated elsewhere either way — the Pallas warp kernels'
    data-dependent band sparsity, see bench.py::_smooth_disp — this form
    is simply the layout-sound one.)
    """
    tl, bs, H, W = disp_gt.shape
    depth = disp_to_depth(disp_gt, focal_length, baseline)      # (tl,bs,H,W)
    rays = [cam.ray[:, k].reshape(H, W) for k in range(3)]      # 3 x (H,W)

    # world xyz per source frame, as 3 planes (tl, bs, H, W):
    # xyz = (depth * ray - t) @ R   (row-vector convention of unproject)
    pk = [depth * rays[k][None, None] - t[..., k, None, None]
          for k in range(3)]
    xw = [sum(pk[j] * R[:, :, j, k, None, None] for j in range(3))
          for k in range(3)]

    # into every target frame i: xyz @ R_i^T + t_i, then K projection.
    # Broadcast to (tl_t, tl_s, bs, H, W) planes — i/j extents stay in
    # MAJOR dims, H/W keep the (8, 128) tiling.
    Rt = R[:, None, :, :, :, None, None]                 # (t,1,bs,3,3,1,1)
    tt = t[:, None, :, :, None, None]                    # (t,1,bs,3,1,1)
    xc = [sum(xw[j][None] * Rt[:, :, :, k, j] for j in range(3))
          + tt[:, :, :, k] for k in range(3)]
    K = cam.K
    zi = 1.0 / (jax.nn.relu(K[2, 0] * xc[0] + K[2, 1] * xc[1]
                            + K[2, 2] * xc[2]) + 1e-12)
    u = (K[0, 0] * xc[0] + K[0, 1] * xc[1] + K[0, 2] * xc[2]) * zi
    v = (K[1, 0] * xc[0] + K[1, 1] * xc[1] + K[1, 2] * xc[2]) * zi

    # pair order: flow[i, j] maps frame-i pixels into frame j — source
    # depth i (axis 's') projected into target j (axis 't'); the planes
    # above are (t, s, ...), so swap to (s, t, ...) = (i, j, ...)
    flow_u = jnp.swapaxes(u - cam.grid[..., 0][None, None, None], 0, 1)
    flow_v = jnp.swapaxes(v - cam.grid[..., 1][None, None, None], 0, 1)
    flow = jnp.stack([flow_u, flow_v], axis=-1)
    diag = jnp.eye(tl, dtype=flow.dtype).reshape(tl, tl, 1, 1, 1, 1)
    return jax.lax.stop_gradient(flow * (1.0 - diag))


def _gauss_blur5(x, sigma):
    """Per-frame 5x5 separable Gaussian blur. x: (n, H, W); sigma: (n, 1, 1).
    Matches cv2.GaussianBlur(ksize=5, sigmaX=sigma): kernel exp(-j^2/2s^2)
    normalized, REFLECT_101 borders."""
    offs = jnp.arange(-2.0, 3.0)
    w = jnp.exp(-(offs ** 2)[None, :] / (2.0 * sigma.reshape(-1, 1) ** 2))
    w = w / jnp.sum(w, axis=1, keepdims=True)            # (n, 5)

    def pass1d(v, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (2, 2)
        vp = jnp.pad(v, pad, mode="reflect")
        n = v.shape[axis]
        acc = 0.0
        for j in range(5):
            sl = [slice(None)] * 3
            sl[axis] = slice(j, j + n)
            acc = acc + w[:, j, None, None] * vp[tuple(sl)]
        return acc

    return pass1d(pass1d(x, 2), 1)


def augment_batch_device(batch, rng: jax.Array, ctx: LossContext):
    """In-graph training augmentation of the IR + ambient images — the
    max_shift=0 menu of the reference CPU augmentation (reference
    data/data_manipulation.py:114-195, defaults data/dataset.py:67-70):
    Gaussian blur p=0.5 (independent sigmas for IR/ambient), per-pixel
    Gaussian noise with per-frame scale, salt & pepper p=0.5 on the IR
    (levels = the frame's pre-noise min/max), clip to [0, 1]. Disparity
    maps are unchanged (the affine shear/shift that would offset them is
    disabled by the reference defaults)."""
    tl, bs, H, W = batch.im.shape
    n = tl * bs
    im = batch.im.reshape(n, H, W)
    amb = batch.ambient.reshape(n, H, W)
    ks = jax.random.split(rng, 10)
    uni = lambda k, lo, hi: jax.random.uniform(k, (n, 1, 1), minval=lo,
                                               maxval=hi)

    min_val = jnp.min(im, axis=(1, 2), keepdims=True)
    max_val = jnp.max(im, axis=(1, 2), keepdims=True)

    # blur (one coin per frame, separate sigmas — reference :63-67)
    blur_on = uni(ks[0], 0.0, 1.0) < 0.5
    im = jnp.where(blur_on, _gauss_blur5(im, uni(ks[1], 0.2, ctx.aug_max_blur)),
                   im)
    amb = jnp.where(blur_on,
                    _gauss_blur5(amb, uni(ks[2], 0.2, ctx.aug_max_blur)), amb)

    # per-pixel Gaussian noise, per-frame scale (reference :69-71)
    im = im + (jax.random.normal(ks[3], im.shape)
               * uni(ks[4], 0.0, ctx.aug_max_noise) / 255.0)
    amb = amb + (jax.random.normal(ks[5], amb.shape)
                 * uni(ks[6], 0.0, ctx.aug_max_noise) / 255.0)

    # salt & pepper on the IR image (reference :73-81; the reference draws
    # size*ratio indices with replacement == per-pixel Bernoulli(ratio))
    sp_on = uni(ks[7], 0.0, 1.0) < 0.5
    ratio = jnp.where(sp_on, uni(ks[8], 0.0, ctx.aug_max_sp_noise), 0.0)
    u = jax.random.uniform(ks[9], (2,) + im.shape)
    im = jnp.where(u[0] < ratio, max_val, im)
    im = jnp.where(u[1] < ratio, min_val, im)

    im = jnp.clip(im, 0.0, 1.0)
    amb = jnp.clip(amb, 0.0, 1.0)
    return batch._replace(im=im.reshape(tl, bs, H, W),
                          ambient=amb.reshape(tl, bs, H, W))


def preprocess_images(batch, lcn_radius: int = 5):
    """LCN-normalize IR and build the 2-channel net input (merged tl*bs).

    Returns (net_in (tl*bs, H, W, 2), im_lcn (tl*bs, H, W),
    im_std (tl*bs, H, W), amb (tl*bs, H, W))."""
    tl, bs, H, W = batch.im.shape
    im = batch.im.reshape(tl * bs, H, W)
    im_lcn, im_std = lcn(im, lcn_radius, 0.05)
    net_in = jnp.stack([im_lcn, im], axis=-1)
    amb = batch.ambient.reshape(tl * bs, H, W)
    return net_in, im_lcn, im_std, amb


def _sgm_warmup_term(out, sgm_disp, rng, ctx: LossContext):
    """Masked L1 to SGM disparities with sigma=1.5 noise
    (reference single_frame_worker.py:157-163)."""
    valid = (sgm_disp > ctx.sgm_valid_threshold).astype(out.dtype)
    noise = ctx.sgm_noise_sigma * jax.random.normal(rng, out.shape, out.dtype)
    err = jnp.abs(out - sgm_disp + noise) * valid
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0)


def sf_losses(outs, batch, ctx: LossContext, *, train: bool,
              epoch: jax.Array, rng: jax.Array):
    """DIS-SF / DIS-FTSF loss vector.

    outs: tuple of 4 full-res disparity maps (tl*bs, H, W, 1), finest first.
    Returns (total, components) with components ordered like the reference's
    errs list for logging parity.
    """
    tl, bs, H, W = batch.im.shape
    _, im_lcn, im_std, amb = preprocess_images(batch, ctx.lcn_radius)

    comps = []
    # photometric, all scales (pyramid: scale s at 1/2^s resolution with
    # rescaled disparities — see LossContext.photometric_pyramid)
    from ..ops.sampling import resize_bilinear
    im_raw = batch.im.reshape(tl * bs, H, W)
    for s, o in enumerate(outs):
        if s == 0 or not ctx.photometric_pyramid:
            val, _ = photometric_loss(o[..., 0], im_lcn, ctx.pattern_lcn,
                                      std=im_std)
        else:
            h_s, w_s = H >> s, W >> s
            im_s = resize_bilinear(im_raw[..., None], h_s, w_s,
                                   align_corners=False)[..., 0]
            im_lcn_s, std_s = lcn(im_s, ctx.lcn_radius, 0.05)
            # CTD head semantics: the scale-s head's alpha = max_disp/2^s
            # means its output IS disparity in scale-s pixel units (0..16
            # at s=3 spans the full 0..128 full-res range) — use the values
            # directly at scale-s resolution, do NOT rescale them (a /2^s
            # here pins the heads at 1/2^s of their own range and fights
            # the decoder skips; measured: pyramid tracked WORSE than
            # full-res until this was removed)
            disp_s = resize_bilinear(o, h_s, w_s,
                                     align_corners=False)[..., 0]
            val, _ = photometric_loss(disp_s, im_lcn_s, ctx.pattern_pyr[s - 1],
                                      std=std_s, max_disp=128 >> s)
        comps.append(val / (2 ** s))
    # smoothness, scale 0
    comps.append(ctx.smooth_weight_sf * smoothness_loss(outs[0][..., 0], amb))
    # geometric, scale 0
    ge_num = ctx.track_length * (ctx.track_length - 1) / 2
    disp0 = outs[0][..., 0].reshape(tl, bs, H, W)
    depth = disp_to_depth(disp0, ctx.focal_length, ctx.baseline)
    if ctx.flow_source == "pred":
        # GT-free in-graph correspondences from the current prediction
        # (stop-gradient inside rigid_flow_device): the flow the geometric
        # consistency check uses improves with the disparity it checks
        flow = rigid_flow_device(ctx.cam, jax.lax.stop_gradient(disp0),
                                 batch.R, batch.t, ctx.focal_length,
                                 ctx.baseline)
    else:
        flow = batch.flow
    ge = geometric_loss_sf(ctx.cam, depth, batch.R, batch.t, flow,
                           batch.ambient, clamp=ctx.geo_clamp,
                           max_shift=ctx.geo_max_shift)
    comps.append(ctx.geo_weight / ge_num * ge)

    if ctx.use_pseudo_gt:
        pseudo = batch.pseudo_gt.reshape(tl * bs, H, W)
        for s, o in enumerate(outs):
            val = jnp.mean(jnp.abs(o[..., 0] - pseudo))
            comps.append(ctx.pseudo_weight * val / (2 ** s))

    if train and ctx.data_type == "real":
        sgm = batch.sgm_disp.reshape(tl * bs, H, W)
        gate = (epoch < ctx.warmup_epochs).astype(jnp.float32)
        rngs = jax.random.split(rng, len(outs))
        for s, o in enumerate(outs):
            val = _sgm_warmup_term(o[..., 0], sgm, rngs[s], ctx)
            comps.append(ctx.sgm_weight * gate * val)

    comps = jnp.stack(comps)
    return jnp.sum(comps), comps


def mf_losses(out, batch, ctx: LossContext, *, train: bool,
              epoch: jax.Array, rng: jax.Array):
    """DIS-MF loss vector. out: (tl, bs, H, W, 1)."""
    tl, bs, H, W = batch.im.shape
    _, im_lcn, im_std, amb = preprocess_images(batch, ctx.lcn_radius)
    o = out[..., 0].reshape(tl * bs, H, W)

    comps = []
    val, _ = photometric_loss(o, im_lcn, ctx.pattern_lcn, std=im_std)
    comps.append(val)
    comps.append(ctx.smooth_weight_mf * smoothness_loss(o, amb))

    ge_num = ctx.track_length * (ctx.track_length - 1) / 2
    depth = disp_to_depth(out[..., 0], ctx.focal_length, ctx.baseline)
    primary_depth = disp_to_depth(batch.primary_disp, ctx.focal_length,
                                  ctx.baseline)
    ge = geometric_loss_mf(ctx.cam, depth, batch.R, batch.t, batch.flow,
                           batch.ambient, primary_depth,
                           max_shift=ctx.geo_max_shift)
    comps.append(ctx.geo_weight / ge_num * ge)

    if train:
        gate = (epoch < ctx.mf_primary_warmup_epochs).astype(jnp.float32)
        val = jnp.mean(jnp.abs(out[..., 0] - batch.primary_disp))
        comps.append(ctx.mf_primary_warmup_weight * gate * val)

        if ctx.data_type == "real":
            sgm = batch.sgm_disp.reshape(tl * bs, H, W)
            gate_sgm = (epoch < ctx.warmup_epochs).astype(jnp.float32)
            val = _sgm_warmup_term(o, sgm, rng, ctx)
            comps.append(ctx.sgm_weight * gate_sgm * val)

    comps = jnp.stack(comps)
    return jnp.sum(comps), comps
