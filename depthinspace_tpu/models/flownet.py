"""Learned optical flow: a small PWC-style coarse-to-fine network in JAX.

Replaces the reference's external LiteFlowNet dependency (reference
data/presave_optical_flow_data.py:40-43 shells out to a forked
pytorch-liteflownet checkpoint; the reference README.md:46-47 notes any
dense-flow method may substitute). This net is trained in-repo on renderer
output, where the static-scene rigid flow derived from ground-truth depth +
camera poses is the exact optical flow — free supervision at any scale
(tools/train_flow.py).

TPU-first design
----------------
- The cost volume is *static-shift* correlation: ``corr[dy,dx] =
  <f1, shift(f2, dy, dx)>`` enumerated over a (2r+1)^2 window with padded
  static slices — no per-pixel gathers (which serialize pathologically on
  this stack, see ops/pallas/warp_kernel.py), fully differentiable, and XLA
  fuses the products into the surrounding convs.
- Coarse-to-fine over 3 pyramid levels (1/16, 1/8, 1/4): each level warps
  the source features by the upsampled flow estimate and predicts a
  residual. The feature warp uses the gather-based differentiable warp
  (ops/sampling.py) — at <=1/4 resolution the gather volume is 16-64x
  smaller than the full-res warps that motivated the Pallas kernels, and
  the flow gradient must pass through the warp.
- Final 1/4-res flow is upsampled 4x with value rescaling (resize_flow).

The search envelope is r * (16 + 8 + 4) = 112 px of full-res displacement
for r=4 — comfortably above the synthetic tracks' motion distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sampling import warp, resize_flow


def correlation(f1: jax.Array, f2: jax.Array, radius: int = 4) -> jax.Array:
    """Normalized correlation cost volume from static shifts.

    f1, f2: (N, H, W, C). Returns (N, H, W, (2r+1)^2), entry (dy, dx) =
    mean_c f1[y, x, c] * f2[y + dy, x + dx, c] (zeros beyond the border).
    """
    n, h, w, c = f1.shape
    r = radius
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    cols = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            sl = f2p[:, dy:dy + h, dx:dx + w, :]
            cols.append(jnp.mean(f1 * sl, axis=-1))
    return jnp.stack(cols, axis=-1) / jnp.sqrt(jnp.float32(c))


class _Encoder(nn.Module):
    """Shared feature pyramid: levels at 1/2, 1/4, 1/8, 1/16."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        feats = []
        for i, ch in enumerate((16, 32, 64, 96)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=dt, name=f"down{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt,
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            feats.append(x)
        return feats            # [1/2, 1/4, 1/8, 1/16]


class _FlowDecoder(nn.Module):
    """Per-level residual flow predictor."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr, feat, flow_up):
        dt = self.dtype
        x = jnp.concatenate([corr, feat, flow_up.astype(dt)], axis=-1)
        for i, ch in enumerate((96, 64, 32)):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt,
                        name=f"dec{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        res = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                      name="flow_head")(x)
        return flow_up + res


class FlowNet(nn.Module):
    """Two-frame dense optical flow. __call__(img1, img2) with (N, H, W, 1)
    grayscale inputs (H, W divisible by 16); returns a list of flow fields
    coarse-to-fine: [(N,H/16,W/16,2), (N,H/8,W/8,2), (N,H/4,W/4,2),
    (N,H,W,2)] — the last entry is the full-res prediction, training
    supervises all levels."""
    radius: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    # LCN-normalize every input channel (radius-5, like the DispNet input
    # contract): correspondence lives in local contrast, and the textured
    # ambient renders carry their texture at ~1% absolute intensity —
    # far below the shading/albedo variation that otherwise dominates the
    # encoder's dynamic range
    lcn_input: bool = True

    @nn.compact
    def __call__(self, img1, img2):
        dt = self.compute_dtype
        if self.lcn_input:
            from ..ops import lcn

            def norm(x):
                n, h, w, c = x.shape
                flat = jnp.moveaxis(x, -1, 1).reshape(n * c, h, w)
                out, _ = lcn(flat, 5, 0.05)
                return jnp.moveaxis(out.reshape(n, c, h, w), 1, -1)
            img1, img2 = norm(img1), norm(img2)
        enc = _Encoder(dtype=dt, name="encoder")
        p1 = enc(img1.astype(dt))
        p2 = enc(img2.astype(dt))

        flows = []
        flow = None
        # levels: index into the pyramid, coarsest first (1/16, 1/8, 1/4)
        for li in (3, 2, 1):
            f1, f2 = p1[li], p2[li]
            n, h, w, _ = f1.shape
            if flow is None:
                flow_up = jnp.zeros((n, h, w, 2), jnp.float32)
            else:
                flow_up = resize_flow(flow, h, w)
            f2w = warp(f2.astype(jnp.float32), flow_up,
                       padding="zeros").astype(dt)
            corr = correlation(f1, f2w, self.radius)
            flow = _FlowDecoder(dtype=dt, name=f"level{li}")(
                corr, f1, flow_up)
            flows.append(flow)

        H, W = img1.shape[1], img1.shape[2]
        flows.append(resize_flow(flow, H, W))
        return flows


def flow_input(im: jax.Array, amb: jax.Array, in_channels: int) -> jax.Array:
    """Stack the FlowNet input channels: [ambient, IR] (2ch) or ambient.

    im/amb: (..., H, W) f32.  2-channel is the trained default — synthetic
    ambient is near-textureless shading while the IR dots carry a dense
    (disparity-difference) cue; the net combines both (tools/train_flow.py).
    """
    if in_channels == 2:
        return jnp.stack([amb, im], axis=-1)
    return amb[..., None]


def flow_all_pairs(flow_net, flow_params, im, amb,
                   in_channels: int = 2) -> jax.Array:
    """All ordered-pair flow from a frozen FlowNet, in-graph.

    im/amb: (tl, n, H, W) f32.  Returns (tl, tl, n, H, W, 2) with a zero
    diagonal — the layout datasets collate from flow.hdf5 — under
    stop_gradient (the provider is frozen, like the reference's offline
    LiteFlowNet, data/presave_optical_flow_data.py:40-43, but fused into
    the consuming step so no (tl,tl,n,H,W,2) block ever crosses the host
    tunnel)."""
    tl, n, H, W = im.shape
    pairs = [(i, j) for i in range(tl) for j in range(tl) if i != j]
    x = flow_input(im, amb, in_channels)          # (tl, n, H, W, C)
    src = jnp.concatenate([x[i] for i, _ in pairs], axis=0)
    dst = jnp.concatenate([x[j] for _, j in pairs], axis=0)
    fl = flow_net.apply(flow_params, src, dst)[-1]
    fl = fl.reshape(len(pairs), n, H, W, 2)
    out = jnp.zeros((tl, tl, n, H, W, 2), jnp.float32)
    for p, (i, j) in enumerate(pairs):
        out = out.at[i, j].set(fl[p])
    return jax.lax.stop_gradient(out)


def multiscale_epe_loss(flows, flow_gt, weights=(0.32, 0.16, 0.08, 0.04)):
    """Supervised multi-scale robust flow loss (generalized Charbonnier,
    q=0.4 like PWC-Net fine-tuning). flow_gt: (N, H, W, 2) full-res."""
    total = 0.0
    for fl, wgt in zip(flows, weights):
        h, w = fl.shape[1], fl.shape[2]
        gt = resize_flow(flow_gt, h, w)
        err = jnp.sum(jnp.abs(fl - gt), axis=-1)
        total = total + wgt * jnp.mean((err + 0.01) ** 0.4)
    return total


def epe(flow, flow_gt):
    """Mean endpoint error."""
    return jnp.mean(jnp.linalg.norm(flow - flow_gt, axis=-1))
