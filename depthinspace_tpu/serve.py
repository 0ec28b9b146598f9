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
- **SF and MF**: :class:`DisparityServer` takes single IR images (n, H, W);
  :class:`TrackDisparityServer` takes full 4-frame tracks with poses and
  runs the complete DIS pipeline — LCN, DIS-SF primary disparity, pairwise
  optical flow (provided, or the in-repo learned FlowNet in-graph), DIS-MF
  fusion — as ONE jitted XLA program per bucket.
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


class TrackDisparityServer:
    """Full DIS pipeline inference on 4-frame tracks.

    One jitted program per request bucket runs: LCN preprocessing, the
    DIS-SF network (primary disparity), pairwise optical flow between all
    ordered frame pairs (the learned FlowNet, models/flownet.py — unless
    the caller supplies flow), and the DIS-MF FuseNet refinement.  This is
    the deployment form of the staged offline pipeline (presave_flow ->
    presave_disp -> FuseNet; reference data/presave_disp.py:88-114) folded
    into a single device program.

    >>> srv = TrackDisparityServer.from_checkpoints(
    ...     "output/single_frame/net_0029.params",
    ...     "output/multi_frame/net_0009.params",
    ...     flow_params_path="output/flownet.msgpack")
    >>> disp = srv.infer(im, ambient, R, t)    # (n, tl, H, W) -> same
    """

    def __init__(self, sf_params, mf_params, flow_params=None,
                 imsize=(512, 432), K=None, baseline: float = 0.025,
                 track_length: int = 4, max_disp: float = 128.0,
                 max_tracks: int = 4, lcn_radius: int = 5, mesh=None,
                 compute_dtype=jnp.bfloat16, flow_in_channels: int = 2):
        from .models import FuseNet
        from .models.flownet import FlowNet
        from .ops import disp_to_depth

        enable_compilation_cache()
        H, W = self.imsize = tuple(imsize)
        tl = self.track_length = int(track_length)
        self.max_tracks = int(max_tracks)
        self.mesh = mesh
        if K is None:
            K = np.array([[435.2, 0, W / 2], [0, 435.2, H / 2], [0, 0, 1]],
                         np.float32)
        K = np.asarray(K, np.float32)
        focal = float(K[0, 0])

        self._sf = DispNet(max_disp=max_disp)
        self._mf = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                           track_length=tl, max_disp=max_disp,
                           compute_dtype=compute_dtype, use_remat=False)
        self._flow = FlowNet() if flow_params is not None else None
        self._flow_ch = int(flow_in_channels)
        self.params = dict(sf=sf_params, mf=mf_params, flow=flow_params)
        if mesh is not None:
            from .parallel import replicated
            self.params = jax.device_put(self.params, replicated(mesh))

        # ordered frame pairs (i, j), i != j — flow_{ij} = flow i -> j
        pairs = [(i, j) for i in range(tl) for j in range(tl) if i != j]

        @jax.jit
        def _infer(params, im_u16, amb_u16, R, t, flow_i16):
            """im/amb (tl, n, H, W) u16; R (tl, n, 3, 3); t (tl, n, 3);
            flow_i16 (tl, tl, n, H, W, 2) int16 x256 or None (learned)."""
            n = im_u16.shape[1]
            im = im_u16.astype(jnp.float32) * (1.0 / 65535.0)
            amb = amb_u16.astype(jnp.float32) * (1.0 / 65535.0)

            im_lcn, _ = lcn(im.reshape(tl * n, H, W), lcn_radius, 0.05)
            ir = jnp.stack([im_lcn, im.reshape(tl * n, H, W)], axis=-1)
            primary = self._sf.apply(params["sf"], ir)[0]       # (tl*n,H,W,1)

            if flow_i16 is not None:
                flow = flow_i16.astype(jnp.float32) * (1.0 / 256.0)
            else:
                from .models.flownet import flow_all_pairs
                flow = flow_all_pairs(self._flow, params["flow"],
                                      im.reshape(tl, n, H, W),
                                      amb.reshape(tl, n, H, W),
                                      self._flow_ch)

            pd = primary.reshape(tl, n, H, W, 1)
            pdepth = disp_to_depth(pd, focal, baseline)
            out = self._mf.apply(params["mf"], ir.reshape(tl, n, H, W, 2),
                                 amb[..., None], pd, pdepth, R, t, flow)
            disp = out[..., 0]                                  # (tl, n, H, W)
            return jnp.clip(disp * 256.0 + 0.5, 0, 65535).astype(jnp.uint16)

        self._infer = _infer

    @classmethod
    def from_checkpoints(cls, sf_params_path, mf_params_path,
                         flow_params_path=None, **kw):
        """Load the three checkpoint artifacts (net_%04d.params msgpack for
        SF/MF — same contract as retest/presave — plus the train_flow
        msgpack for the learned flow provider)."""
        from .models import FuseNet
        from .tools.train_flow import load_flow_params

        H, W = kw.get("imsize", (512, 432))
        tl = kw.get("track_length", 4)
        max_disp = kw.get("max_disp", 128.0)
        K = kw.get("K")
        if K is None:
            K = np.array([[435.2, 0, W / 2], [0, 435.2, H / 2], [0, 0, 1]],
                         np.float32)
            kw["K"] = K

        sf_model = DispNet(max_disp=max_disp)
        sf_tpl = sf_model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
        sf_params = load_net_params(Path(sf_params_path), sf_tpl)

        mf_model = FuseNet(imsize=(H, W),
                           K=tuple(map(tuple, np.asarray(K).tolist())),
                           track_length=tl, max_disp=max_disp)
        z = jnp.zeros
        mf_tpl = mf_model.init(
            jax.random.key(0), z((tl, 1, H, W, 2)), z((tl, 1, H, W, 1)),
            z((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
            jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), z((tl, 1, 3)),
            z((tl, tl, 1, H, W, 2)))
        mf_params = load_net_params(Path(mf_params_path), mf_tpl)

        flow_params = None
        if flow_params_path:
            flow_params, n_ch = load_flow_params(Path(flow_params_path),
                                                 (H, W))
            kw.setdefault("flow_in_channels", n_ch)
        return cls(sf_params, mf_params, flow_params, **kw)

    def infer(self, im, ambient, R, t, flow=None) -> np.ndarray:
        """im/ambient (n, tl, H, W) f32 [0,1]; R (n, tl, 3, 3); t (n, tl, 3);
        flow optional (n, tl, tl, H, W, 2) f32 pixels — omitted => learned
        FlowNet in-graph (requires flow_params).  Returns refined disparity
        (n, tl, H, W) f32."""
        if flow is None and self._flow is None:
            raise ValueError("no flow provided and no flow_params loaded")
        im = np.asarray(im, np.float32)
        n = im.shape[0]
        outs = []
        for lo in range(0, n, self.max_tracks):
            sl = slice(lo, lo + self.max_tracks)
            outs.append(self._run_bucket(im[sl],
                                         np.asarray(ambient, np.float32)[sl],
                                         np.asarray(R, np.float32)[sl],
                                         np.asarray(t, np.float32)[sl],
                                         None if flow is None
                                         else np.asarray(flow, np.float32)[sl]))
        return np.concatenate(outs, axis=0)

    def _run_bucket(self, im, amb, R, t, flow):
        m = im.shape[0]
        b = _bucket(m, self.max_tracks)
        if self.mesh is not None:
            sz = self.mesh.devices.size
            b = max(b, sz)
            b += (-b) % sz

        def pad(x):
            if x is None or x.shape[0] == b:
                return x
            return np.concatenate(
                [x, np.repeat(x[-1:], b - x.shape[0], axis=0)], axis=0)

        im, amb, R, t, flow = map(pad, (im, amb, R, t, flow))
        enc = lambda x: np.clip(x * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
        # host API is track-major-per-request (n, tl, ...); device layout is
        # tl-major
        im_d = enc(np.moveaxis(im, 0, 1))
        amb_d = enc(np.moveaxis(amb, 0, 1))
        R_d = np.moveaxis(R, 0, 1)
        t_d = np.moveaxis(t, 0, 1)
        flow_d = (None if flow is None else
                  np.clip(np.rint(np.moveaxis(flow, 0, 2) * 256.0),
                          -32768, 32767).astype(np.int16))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel import DATA_AXIS
            sh = lambda ax: NamedSharding(
                self.mesh, P(*([None] * ax + [DATA_AXIS])))
            im_d = jax.device_put(im_d, sh(1))
            amb_d = jax.device_put(amb_d, sh(1))
            R_d = jax.device_put(R_d, sh(1))
            t_d = jax.device_put(t_d, sh(1))
            if flow_d is not None:
                flow_d = jax.device_put(flow_d, sh(2))
        out = np.asarray(self._infer(self.params, im_d, amb_d, R_d, t_d,
                                     flow_d))
        disp = out.astype(np.float32) * (1.0 / 256.0)           # (tl, b, H, W)
        return np.moveaxis(disp, 0, 1)[:m]
