"""Pre-save network disparities for the staged training pipeline.

  python -m depthinspace_tpu.tools.presave_disp single_frame --epoch 49
  python -m depthinspace_tpu.tools.presave_disp multi_frame  --epoch 49 \\
      [--flow_source rigid]

Runs a trained network over every sample directory and writes
``<sample>/<architecture>_disp.hdf5`` with dataset 'disp' of shape
(4, 1, H, W) — the hand-off files consumed by DIS-MF training
(single_frame_disp.hdf5) and DIS-FTSF pseudo-ground-truth
(multi_frame_disp.hdf5). Mirrors the reference tool's I/O contract
(reference data/presave_disp.py:41-117) with a jitted inference step.

Throughput notes (the tunnel's host<->device bandwidth bounds this tool,
data/wire.py): samples are processed in batches of ``--batch`` per jit
call, images/disparities cross as uint16 fixed point both ways, and with
``--flow_source rigid`` the (tl,tl,H,W,2) flow block is computed in-graph
from GT disparity + poses (exact on static synthetic scenes) instead of
being read from flow.hdf5 and shipped — required for pipelines trained
with ``--flow_source rigid``, where no flow.hdf5 exists.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import h5py

from ..config import load_paths
from ..data import load_settings
from ..utils.jaxcfg import enable_compilation_cache


def _enc_unit(x):
    return np.clip(x * 65535.0 + 0.5, 0, 65535).astype(np.uint16)


def _enc_disp(x):
    return np.clip(x * 256.0 + 0.5, 0, 65535).astype(np.uint16)


def build_sf_infer(settings, lcn_radius=5):
    import jax
    import jax.numpy as jnp
    from ..models import DispNet
    from ..ops import lcn

    model = DispNet(max_disp=128.0)
    H, W = settings.imsize
    template = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))

    @jax.jit
    def infer(params, im_u16):
        """im_u16: (N, H, W) x65535 -> (N, H, W) u16 disparity x256."""
        im = im_u16.astype(jnp.float32) * (1.0 / 65535.0)
        im_lcn, _ = lcn(im, lcn_radius, 0.05)
        net_in = jnp.stack([im_lcn, im], axis=-1)
        disp = model.apply(params, net_in)[0][..., 0]
        return jnp.clip(disp * 256.0 + 0.5, 0, 65535).astype(jnp.uint16)

    return template, infer


def build_mf_infer(settings, track_length=4, lcn_radius=5,
                   flow_source="file", flow_in_channels=2):
    import jax
    import jax.numpy as jnp
    from ..models import FuseNet
    from ..ops import lcn, disp_to_depth
    from ..train.objective import rigid_flow_device
    from ..losses.geometric import CameraGeometry

    H, W = settings.imsize
    K = tuple(map(tuple, settings.K.tolist()))
    model = FuseNet(imsize=(H, W), K=K, track_length=track_length,
                    max_disp=128.0)
    tl = track_length
    cam = CameraGeometry.create(settings.K, H, W)
    z = jnp.zeros
    template = model.init(
        jax.random.key(0), z((tl, 1, H, W, 2)), z((tl, 1, H, W, 1)),
        z((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), z((tl, 1, 3)),
        z((tl, tl, 1, H, W, 2)))

    def _core(params, cam_, im, amb, primary, R, t, flow):
        im_lcn, _ = lcn(im.reshape(tl * im.shape[1], H, W), lcn_radius, 0.05)
        im_lcn = im_lcn.reshape(im.shape)
        ir = jnp.stack([im_lcn, im], axis=-1)               # (tl,N,H,W,2)
        pd = primary[..., None]
        pdepth = disp_to_depth(pd, settings.focal_length, settings.baseline)
        out = model.apply(params, ir, amb[..., None], pd, pdepth, R, t, flow)
        return jnp.clip(out[..., 0] * 256.0 + 0.5, 0, 65535).astype(
            jnp.uint16)

    if flow_source == "rigid":
        @jax.jit
        def infer(params, cam_, im_u16, amb_u16, primary_u16, dispgt_u16,
                  R, t):
            """All image args (tl, N, H, W) u16; flow computed in-graph."""
            s = jnp.float32
            im = im_u16.astype(s) * (1.0 / 65535.0)
            amb = amb_u16.astype(s) * (1.0 / 65535.0)
            primary = primary_u16.astype(s) * (1.0 / 256.0)
            disp_gt = dispgt_u16.astype(s) * (1.0 / 256.0)
            flow = rigid_flow_device(cam_, disp_gt, R, t,
                                     settings.focal_length,
                                     settings.baseline)
            return _core(params, cam_, im, amb, primary, R, t, flow)
    elif flow_source == "pred":
        @jax.jit
        def infer(params, cam_, im_u16, amb_u16, primary_u16, R, t):
            """GT-free in-graph flow from the presaved primary (SF-predicted)
            disparities + poses — the provider MF training uses with
            --flow_source pred (train/steps.py)."""
            s = jnp.float32
            im = im_u16.astype(s) * (1.0 / 65535.0)
            amb = amb_u16.astype(s) * (1.0 / 65535.0)
            primary = primary_u16.astype(s) * (1.0 / 256.0)
            flow = rigid_flow_device(cam_, primary, R, t,
                                     settings.focal_length,
                                     settings.baseline)
            return _core(params, cam_, im, amb, primary, R, t, flow)
    elif flow_source == "net":
        from ..models.flownet import FlowNet, flow_all_pairs
        flow_net = FlowNet()

        @jax.jit
        def infer(params, cam_, flow_params, im_u16, amb_u16, primary_u16,
                  R, t):
            """GT-free in-graph flow from the frozen FlowNet — the provider
            MF training used with --flow_source net (train/steps.py), so
            presaved MF disparities match the training-time flow."""
            s = jnp.float32
            im = im_u16.astype(s) * (1.0 / 65535.0)
            amb = amb_u16.astype(s) * (1.0 / 65535.0)
            primary = primary_u16.astype(s) * (1.0 / 256.0)
            flow = flow_all_pairs(flow_net, flow_params, im, amb,
                                  flow_in_channels)
            return _core(params, cam_, im, amb, primary, R, t, flow)
    else:
        @jax.jit
        def infer(params, cam_, im_u16, amb_u16, primary_u16, flow_i16,
                  R, t):
            """flow_i16: (tl, tl, N, H, W, 2) int16 x256."""
            s = jnp.float32
            im = im_u16.astype(s) * (1.0 / 65535.0)
            amb = amb_u16.astype(s) * (1.0 / 65535.0)
            primary = primary_u16.astype(s) * (1.0 / 256.0)
            flow = flow_i16.astype(s) * (1.0 / 256.0)
            return _core(params, cam_, im, amb, primary, R, t, flow)

    return template, infer, cam


def _read_sample(sample: Path, architecture: str, flow_source: str):
    out = {}
    with h5py.File(sample / "frames.hdf5", "r") as f:
        out["im"] = _enc_unit(np.asarray(f["im"][:, 0], np.float32))
        if architecture == "multi_frame":
            out["amb"] = _enc_unit(np.asarray(f["ambient"][:, 0], np.float32))
            out["R"] = np.asarray(f["R"], np.float32)
            out["t"] = np.asarray(f["t"], np.float32)
            if flow_source == "rigid":
                out["disp_gt"] = _enc_disp(
                    np.asarray(f["disp"][:, 0], np.float32))
    if architecture == "multi_frame":
        with h5py.File(sample / "single_frame_disp.hdf5", "r") as f:
            out["primary"] = _enc_disp(np.asarray(f["disp"][:, 0], np.float32))
        if flow_source == "file":
            tl, (H, W) = 4, out["im"].shape[1:]
            flow = np.zeros((tl, tl, H, W, 2), np.float32)
            with h5py.File(sample / "flow.hdf5", "r") as f:
                for i0 in range(tl):
                    for i1 in range(tl):
                        if i0 != i1:
                            flow[i0, i1] = np.moveaxis(
                                np.asarray(f[f"flow_{i0}{i1}"])[0], 0, -1)
            out["flow"] = np.clip(np.rint(flow * 256.0), -32768, 32767
                                  ).astype(np.int16)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("architecture", choices=["single_frame", "multi_frame"])
    ap.add_argument("--epoch", default=-1, type=int)
    ap.add_argument("--data_dir", default=None,
                    help="override DATA_DIR from config.json")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--batch", default=None, type=int,
                    help="samples per jit call (default: 8 SF / 4 MF)")
    ap.add_argument("--flow_source", default="file",
                    choices=["file", "rigid", "net", "pred"],
                    help="multi_frame only: rigid computes flow in-graph "
                         "from GT disparity + poses (synthetic data; no "
                         "flow.hdf5 needed); net uses the frozen learned "
                         "FlowNet in-graph (GT-free); pred computes flow "
                         "in-graph from the presaved primary (SF-predicted) "
                         "disparities + poses (GT-free)")
    ap.add_argument("--flow_params", default=None,
                    help="FlowNet msgpack for --flow_source net "
                         "(default OUTPUT_DIR/flownet.msgpack)")
    ap.add_argument("--ranges", default=None,
                    help="comma-separated lo:hi index ranges into the "
                         "sorted sample list to presave (e.g. "
                         "'512:640,1024:2048'); default: every sample. "
                         "Skipping splits no downstream stage reads cuts "
                         "the host-bound runtime proportionally")
    args = ap.parse_args(argv)

    enable_compilation_cache()
    import jax
    from flax import serialization

    paths = load_paths()
    data_root = Path(args.data_dir or paths["DATA_DIR"])
    output_dir = Path(args.output_dir or paths["OUTPUT_DIR"])
    model_path = output_dir / args.architecture / f"net_{args.epoch:04d}.params"
    settings = load_settings(data_root / "settings.pkl")

    sf = args.architecture == "single_frame"
    B = args.batch or (8 if sf else 4)
    flow_params = None
    if sf:
        template, infer = build_sf_infer(settings)
    else:
        flow_ch = 2
        if args.flow_source == "net":
            from .train_flow import load_flow_params
            fp_path = Path(args.flow_params
                           or (output_dir / "flownet.msgpack"))
            flow_params, flow_ch = load_flow_params(fp_path, settings.imsize)
            print(f"in-graph FlowNet provider: {fp_path} ({flow_ch}-channel)")
        template, infer, cam = build_mf_infer(settings,
                                              flow_source=args.flow_source,
                                              flow_in_channels=flow_ch)

    with open(model_path, "rb") as f:
        params = serialization.from_bytes(template, f.read())

    # enumerate with the worker's split pattern (train/worker.py:109,
    # glob('0*/')) so --ranges indices are guaranteed aligned with the
    # train/test split; a stray non-'0*' dir must not shift the ranges
    sample_dirs = sorted(p for p in data_root.glob("0*")
                         if p.is_dir() and (p / "frames.hdf5").exists())
    if args.ranges:
        keep = []
        for rng in args.ranges.split(","):
            lo, hi = (int(v) for v in rng.split(":"))
            keep.extend(sample_dirs[lo:hi])
        sample_dirs = sorted(set(keep), key=str)
    for lo in range(0, len(sample_dirs), B):
        group = sample_dirs[lo:lo + B]
        data = [_read_sample(s, args.architecture, args.flow_source)
                for s in group]
        n = len(data)
        while len(data) < B:                    # pad the tail batch
            data.append(data[-1])

        if sf:
            im = np.concatenate([d["im"] for d in data], axis=0)  # (4B,H,W)
            disp = np.asarray(infer(params, im)).astype(np.float32) / 256.0
            disp = disp.reshape(B, 4, *disp.shape[1:])
        else:
            st = lambda k: np.stack([d[k] for d in data], axis=1)
            if args.flow_source == "rigid":
                out = infer(params, cam, st("im"), st("amb"), st("primary"),
                            st("disp_gt"), st("R"), st("t"))
            elif args.flow_source == "pred":
                out = infer(params, cam, st("im"), st("amb"), st("primary"),
                            st("R"), st("t"))
            elif args.flow_source == "net":
                out = infer(params, cam, flow_params, st("im"), st("amb"),
                            st("primary"), st("R"), st("t"))
            else:
                flow = np.stack([d["flow"] for d in data], axis=2)
                out = infer(params, cam, st("im"), st("amb"), st("primary"),
                            flow, st("R"), st("t"))
            disp = np.asarray(out).astype(np.float32) / 256.0
            disp = np.moveaxis(disp, 1, 0)                  # (B, 4, H, W)

        for d_idx, sample in enumerate(group[:n]):
            with h5py.File(sample / f"{args.architecture}_disp.hdf5",
                           "w") as f:
                f.create_dataset("disp", data=disp[d_idx][:, None])
        if (lo // B) % 16 == 0:
            print(f"{lo + n}/{len(sample_dirs)}: {group[-1].name}",
                  flush=True)
    print(f"wrote {args.architecture}_disp.hdf5 for {len(sample_dirs)} "
          f"samples")

    # refresh the wire cache's derived field so cached MF/FTSF runs see the
    # NEW disparities, not a stale earlier presave (data/cache.py)
    from ..data.cache import build_wire_cache, CACHE_DIR_NAME
    if (data_root / CACHE_DIR_NAME / "meta.json").exists():
        field = ("primary_disp" if args.architecture == "single_frame"
                 else "pseudo_gt")
        build_wire_cache(data_root, fields=[field], force=True)
        print(f"wire cache field {field!r} refreshed")


if __name__ == "__main__":
    main()
