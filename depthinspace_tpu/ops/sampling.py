"""Bilinear sampling, warping and resizing primitives.

This is the single most reused primitive of the pipeline: the reference calls
``torch.nn.functional.grid_sample`` at 11 sites (reference model/networks.py:
367,521,548,578,583,588,593,633,643,648 and model/multi_frame_networks.py:97),
always with ``align_corners=True`` and either ``border`` or ``zeros`` padding.

TPU-first design notes
----------------------
- We work directly in *pixel* coordinates instead of torch's normalized
  [-1, 1] grid: with align_corners=True the normalization is an exact affine
  round-trip (x_norm = 2*(x/(W-1) - 0.5)), so skipping it is both faster and
  less error-prone.
- Layout is NHWC (channels last) — the native TPU layout.
- The gather is expressed as one flat 1D gather per corner over the collapsed
  (H*W) axis, which XLA lowers to an efficient dynamic-gather; weights and
  masks are fused elementwise VPU ops.
- Fully differentiable wrt both the image and the sample coordinates
  (border mode clamps, so coordinate gradients are zero outside the image,
  matching torch semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("padding",))
def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array,
                    padding: str = "border") -> jax.Array:
    """Sample ``img`` at continuous pixel coordinates (x, y).

    Equivalent to ``torch.nn.functional.grid_sample(img, grid,
    padding_mode=padding, align_corners=True)`` with
    ``grid = 2*((x,y)/(W-1,H-1) - 0.5)``.

    Args:
      img: (N, H, W, C) source image.
      x:   (N, Ho, Wo) horizontal pixel coordinates.
      y:   (N, Ho, Wo) vertical pixel coordinates.
      padding: 'border' (clamp) or 'zeros' (out-of-bounds corners contribute 0).

    Returns:
      (N, Ho, Wo, C) sampled values.
    """
    N, H, W, C = img.shape
    compute_dtype = img.dtype

    if padding == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    elif padding != "zeros":
        raise ValueError(f"unknown padding mode {padding!r}")

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = (x - x0f).astype(compute_dtype)
    wy1 = (y - y0f).astype(compute_dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    img_flat = img.reshape(N, H * W, C)

    def corner(yi, xi):
        # Per-corner validity (torch checks the *integer* corner indices).
        if padding == "zeros":
            valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        else:
            valid = None
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat_idx = yc * W + xc                       # (N, Ho, Wo)
        v = jnp.take_along_axis(
            img_flat,
            flat_idx.reshape(N, -1, 1),
            axis=1,
        ).reshape(*flat_idx.shape, C)
        if valid is not None:
            v = v * valid[..., None].astype(compute_dtype)
        return v

    v00 = corner(y0, x0)
    v01 = corner(y0, x1)
    v10 = corner(y1, x0)
    v11 = corner(y1, x1)

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
           + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    return out


@partial(jax.jit, static_argnames=("padding",))
def warp(x: jax.Array, flow: jax.Array, padding: str = "zeros") -> jax.Array:
    """Warp ``x`` by an optical-flow field: out(p) = x(p + flow(p)).

    Mirrors the reference helper ``warp`` (reference
    model/multi_frame_networks.py:83-99): identity grid + flow, zeros padding,
    align_corners=True.

    Args:
      x:    (N, H, W, C) image/features.
      flow: (N, H, W, 2) flow in pixels, last axis = (u, v).

    Returns:
      (N, H, W, C).
    """
    N, H, W, _ = x.shape
    u = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    v = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    gx = flow[..., 0] + u
    gy = flow[..., 1] + v
    return bilinear_sample(x, gx, gy, padding=padding)


def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> jnp.ndarray:
    """Dense (n_out, n_in) bilinear interpolation matrix (2 taps per row)."""
    import numpy as np
    if align_corners and n_out > 1:
        src = np.linspace(0, n_in - 1, n_out)
    else:
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0, n_in - 1)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (src - i0).astype(np.float32)
    M = np.zeros((n_out, n_in), np.float32)
    np.add.at(M, (np.arange(n_out), i0), 1 - f)
    np.add.at(M, (np.arange(n_out), i1), f)
    return jnp.asarray(M)


@partial(jax.jit, static_argnames=("height", "width", "align_corners"))
def resize_bilinear(x: jax.Array, height: int, width: int,
                    align_corners: bool = True) -> jax.Array:
    """Bilinear resize of an NHWC tensor, as two per-axis matmuls.

    TPU note: a gather-based formulation measured 1331 ms for a 2x upsample
    of (32, 512, 432, 1) on v5e; the separable matmul formulation below runs
    the same resize in 4.4 ms on the MXU (and its autodiff is matmuls too).

    align_corners=True matches ``torch.nn.functional.interpolate(...,
    mode='bilinear', align_corners=True)`` (used by the reference's
    ``resize_like``, reference model/multi_frame_networks.py:42-51);
    align_corners=False matches the torch default used by the DispNetS
    pyramid upsampling (reference model/networks.py:273,291-293):
    half-pixel centers, no anti-aliasing.
    """
    N, H, W, C = x.shape
    if H == height and W == width:
        return x
    Mh = _interp_matrix(H, height, align_corners)
    Mw = _interp_matrix(W, width, align_corners)
    y = jnp.einsum("Hh,nhwc->nHwc", Mh, x,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("Ww,nHwc->nHWc", Mw, y,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    # dtype-preserving: the f32 interp matrices promote bf16 inputs inside
    # the einsum (full f32 accumulation), but the *stored* result must stay
    # in the caller's compute dtype or full-res bf16 activations silently
    # re-inflate to f32 (2x HBM on the FuseNet decoder path).
    return out.astype(x.dtype)


@partial(jax.jit, static_argnames=("height", "width"))
def resize_flow(flow: jax.Array, height: int, width: int) -> jax.Array:
    """Resize a flow field and rescale its values (reference
    ``resize_flow_like``, model/multi_frame_networks.py:54-68)."""
    _, fh, fw, _ = flow.shape
    out = resize_bilinear(flow, height, width, align_corners=True)
    scale = jnp.array([width / fw, height / fh], dtype=out.dtype)
    return out * scale


@partial(jax.jit, static_argnames=("height", "width"))
def resize_mask(mask: jax.Array, height: int, width: int) -> jax.Array:
    """Resize a binary mask with bilinear + re-threshold at 0.5 (reference
    ``resize_flow_masks_like``, model/multi_frame_networks.py:70-81)."""
    out = resize_bilinear(mask, height, width, align_corners=True)
    return (out > 0.5).astype(mask.dtype)
