"""Backend dispatch for image resampling: Pallas kernels on TPU, gather
formulations elsewhere.

Mirrors the reference's cuda/cpu op split (reference
model/ext_functions.py:41-127): one public API, two execution paths with
identical math. On TPU the gather/scatter lowerings are pathologically slow
inside large graphs (see ops/pallas/warp_kernel.py), so everything routes
to the static-slice-enumeration kernels there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def warp_pattern(pattern: jax.Array, disp: jax.Array,
                 max_disp: int = 128) -> jax.Array:
    """Rectified pattern warp: sample pattern at u' = u - disp (border
    clamp). pattern (N,H,W) or (H,W); disp (N,H,W) in [0, max_disp].
    Gradient flows to disp only (the pattern is a constant)."""
    N, H, W = disp.shape
    if pattern.ndim == 2:
        pattern = jnp.broadcast_to(pattern[None], (N, H, W))
    pattern = jax.lax.stop_gradient(pattern)
    if _on_tpu() and H % 8 == 0:
        from .pallas.warp_kernel import xwarp_disparity
        return xwarp_disparity(pattern, disp, int(max_disp))
    from ..losses.photometric import _xwarp_border
    return _xwarp_border(pattern, disp)


def flow_warp(x: jax.Array, flow: jax.Array, max_shift: int = 16) -> jax.Array:
    """Flow warp with zeros padding: out(p) = x(p + flow(p)).

    x (N,H,W,C); flow (N,H,W,2) — always input data in this pipeline, so
    no flow gradient is produced (see ops/pallas/warp_kernel.warp2d)."""
    flow = jax.lax.stop_gradient(flow)
    if _on_tpu() and x.shape[1] % 8 == 0:
        import os
        flow = flow.astype(jnp.float32)   # tap prep needs f32 coordinates
        if os.environ.get("DIS_WARP_V1") == "1":
            # v1 band-window kernel kept as a fallback/baseline (f32-only)
            from .pallas.warp_kernel import warp2d
            if x.dtype != jnp.float32:
                return warp2d(x.astype(jnp.float32), flow,
                              int(max_shift)).astype(x.dtype)
            return warp2d(x, flow, int(max_shift))
        # default: channel-blocked in-kernel-DMA kernel — bit-identical
        # losses, DIS-MF step 1778 -> 1392 ms (bench_mf A/B); handles
        # bf16 natively (f32 weights/accumulation, bf16 DMA)
        from .pallas.warp2d_v2 import warp2d_v2 as warp2d
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            return warp2d(x.astype(jnp.float32), flow,
                          int(max_shift)).astype(x.dtype)
        return warp2d(x, flow, int(max_shift))
    from .sampling import warp
    return warp(x, flow, padding="zeros")


def flow_warp_pairs(feat: jax.Array, flow: jax.Array, src_idx,
                    max_shift: int = 16) -> jax.Array:
    """Pair-indexed flow warp: out[m] = warp(feat[src_idx[m]], flow[m]).

    feat (S,H,W,C); flow (M,H,W,2); src_idx a static index sequence with
    every source appearing equally often (the all-pairs track layout).  On
    TPU the source gather happens inside the Pallas kernel
    (ops/pallas/warp2d_pairs.py) so the pair-major source stack is never
    materialized; elsewhere it falls back to an explicit take + gather warp.
    The kernel path is opt-in (DIS_WARP_PAIRS=1) until its on-hardware
    Mosaic lowering + win is confirmed (scripts/bench_warp_pairs.py);
    default = stacked warp2d_v2."""
    import os
    src_idx = tuple(int(s) for s in src_idx)
    flow = jax.lax.stop_gradient(flow)
    if (_on_tpu() and feat.shape[1] % 8 == 0
            and os.environ.get("DIS_WARP_PAIRS") == "1"):
        from .pallas.warp2d_pairs import warp2d_pairs
        flow = flow.astype(jnp.float32)
        if feat.dtype not in (jnp.float32, jnp.bfloat16):
            return warp2d_pairs(feat.astype(jnp.float32), flow, src_idx,
                                int(max_shift)).astype(feat.dtype)
        return warp2d_pairs(feat, flow, src_idx, int(max_shift))
    # static-index stack of slices (NOT jnp.take: dynamic-gather lowerings
    # are pathologically slow on this TPU stack, ops/pallas/warp_kernel.py)
    stacked = jnp.stack([feat[s] for s in src_idx], axis=0)
    return flow_warp(stacked, flow, max_shift)
