"""Fixed-point wire encoding for host->device batch transfer.

The axon tunnel's host->device bandwidth is the training bottleneck on this
setup (~tens of MB/s; a full-res SF batch is ~85 MB/step as f32, which
costs multiple seconds against a 0.3 s compute step).  The reference never
faces this (PCIe local GPU, data/worker.py feeds f32 tensors); here the
heavy image/disparity fields travel as uint16 fixed point — half the bytes
— and are decoded to f32 *inside* the jitted step.

Formats (chosen against measured data ranges):
  - im / ambient / grad: [0, 1] x 65535        (quantization 1.5e-5)
  - disp_gt / primary_disp / pseudo_gt / sgm_disp: [0, 256) x 256
    (1/256 px — far below any loss/metric threshold)
  - flow: [-128, 128) x 256, stored int16      (1/256 px)
  - R / t: f32 passthrough (tiny)

``decode_batch`` is dtype-driven: f32 fields pass through unchanged, so
un-encoded batches (tests, bench, dryrun) hit the identity path and the
same jitted step serves both.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .dataset import Batch

_UNIT = ("im", "ambient", "grad")                     # [0, 1] fields
_DISP = ("disp_gt", "primary_disp", "pseudo_gt", "sgm_disp")
_DISP_SCALE = 256.0
_FLOW_SCALE = 256.0


def encode_batch(batch: Batch) -> Batch:
    """Host-side (numpy): quantize the heavy f32 fields to 16-bit."""
    out = {}
    for k in Batch._fields:
        v = getattr(batch, k)
        if v is None or v.dtype != np.float32:
            out[k] = v
        elif k in _UNIT:
            out[k] = np.clip(v * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
        elif k in _DISP:
            out[k] = np.clip(v * _DISP_SCALE + 0.5, 0, 65535).astype(np.uint16)
        elif k == "flow":
            out[k] = np.clip(np.rint(v * _FLOW_SCALE), -32768, 32767).astype(
                np.int16)
        else:
            out[k] = v
    return Batch(**out)


def decode_disp_np(disp) -> np.ndarray:
    """Decode a u16-encoded disparity map from eval_step (f32 passthrough)."""
    disp = np.asarray(disp)
    if disp.dtype == np.uint16:
        return disp.astype(np.float32) * (1.0 / _DISP_SCALE)
    return disp.astype(np.float32)


def decode_batch_np(batch: Batch) -> Batch:
    """Host-side decode (numpy) for debug/visualization paths that receive
    an encoded (possibly device-resident) batch."""
    out = {}
    for k in Batch._fields:
        v = getattr(batch, k)
        if v is None:
            out[k] = None
            continue
        v = np.asarray(v)
        if k in _UNIT and v.dtype == np.uint16:
            out[k] = v.astype(np.float32) * (1.0 / 65535.0)
        elif k in _DISP and v.dtype == np.uint16:
            out[k] = v.astype(np.float32) * (1.0 / _DISP_SCALE)
        elif k == "flow" and v.dtype == np.int16:
            out[k] = v.astype(np.float32) * (1.0 / _FLOW_SCALE)
        else:
            out[k] = v
    return Batch(**out)


def decode_batch(batch: Batch) -> Batch:
    """In-jit (jnp): dequantize 16-bit fields back to f32; f32 fields pass
    through (identity for un-encoded batches)."""
    out = {}
    for k in Batch._fields:
        v = getattr(batch, k)
        if v is None or v.dtype == jnp.float32:
            out[k] = v
        elif k in _UNIT and v.dtype == jnp.uint16:
            out[k] = v.astype(jnp.float32) * (1.0 / 65535.0)
        elif k in _DISP and v.dtype == jnp.uint16:
            out[k] = v.astype(jnp.float32) * (1.0 / _DISP_SCALE)
        elif k == "flow" and v.dtype == jnp.int16:
            out[k] = v.astype(jnp.float32) * (1.0 / _FLOW_SCALE)
        else:
            out[k] = v
    return Batch(**out)
