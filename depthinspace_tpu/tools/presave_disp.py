"""Pre-save network disparities for the staged training pipeline.

  python -m depthinspace_tpu.tools.presave_disp single_frame --epoch 49
  python -m depthinspace_tpu.tools.presave_disp multi_frame  --epoch 49

Runs a trained network over every sample directory and writes
``<sample>/<architecture>_disp.hdf5`` with dataset 'disp' of shape
(4, 1, H, W) — the hand-off files consumed by DIS-MF training
(single_frame_disp.hdf5) and DIS-FTSF pseudo-ground-truth
(multi_frame_disp.hdf5). Mirrors the reference tool's I/O contract
(reference data/presave_disp.py:41-117) with a jitted inference step.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
import h5py

from ..config import load_paths
from ..data import load_settings
from ..utils.jaxcfg import enable_compilation_cache


def build_sf_infer(settings, lcn_radius=5):
    import jax
    import jax.numpy as jnp
    from ..models import DispNet
    from ..ops import lcn

    model = DispNet(max_disp=128.0)
    H, W = settings.imsize
    template = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))

    @jax.jit
    def infer(params, im):
        """im: (N, H, W) raw IR -> (N, H, W) full-res disparity."""
        im_lcn, _ = lcn(im, lcn_radius, 0.05)
        net_in = jnp.stack([im_lcn, im], axis=-1)
        return model.apply(params, net_in)[0][..., 0]

    return template, infer


def build_mf_infer(settings, track_length=4, lcn_radius=5):
    import jax
    import jax.numpy as jnp
    from ..models import FuseNet
    from ..ops import lcn, disp_to_depth

    H, W = settings.imsize
    K = tuple(map(tuple, settings.K.tolist()))
    model = FuseNet(imsize=(H, W), K=K, track_length=track_length,
                    max_disp=128.0)
    tl = track_length
    z = jnp.zeros
    template = model.init(
        jax.random.key(0), z((tl, 1, H, W, 2)), z((tl, 1, H, W, 1)),
        z((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), z((tl, 1, 3)),
        z((tl, tl, 1, H, W, 2)))

    @jax.jit
    def infer(params, im, amb, primary_disp, R, t, flow):
        """im/amb/primary_disp: (tl, H, W); R: (tl,3,3); t: (tl,3);
        flow: (tl, tl, H, W, 2) -> (tl, H, W) fused disparity."""
        im_lcn, _ = lcn(im, lcn_radius, 0.05)
        ir = jnp.stack([im_lcn, im], axis=-1)[:, None]      # (tl,1,H,W,2)
        pd = primary_disp[:, None, :, :, None]
        pdepth = disp_to_depth(pd, settings.focal_length, settings.baseline)
        out = model.apply(params, ir, amb[:, None, :, :, None], pd, pdepth,
                          R[:, None], t[:, None], flow[:, :, None])
        return out[:, 0, :, :, 0]

    return template, infer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("architecture", choices=["single_frame", "multi_frame"])
    ap.add_argument("--epoch", default=-1, type=int)
    ap.add_argument("--data_dir", default=None,
                    help="override DATA_DIR from config.json")
    ap.add_argument("--output_dir", default=None)
    args = ap.parse_args(argv)

    enable_compilation_cache()
    import jax
    from flax import serialization

    paths = load_paths()
    data_root = Path(args.data_dir or paths["DATA_DIR"])
    output_dir = Path(args.output_dir or paths["OUTPUT_DIR"])
    model_path = output_dir / args.architecture / f"net_{args.epoch:04d}.params"
    settings = load_settings(data_root / "settings.pkl")

    if args.architecture == "single_frame":
        template, infer = build_sf_infer(settings)
    else:
        template, infer = build_mf_infer(settings)

    with open(model_path, "rb") as f:
        params = serialization.from_bytes(template, f.read())

    sample_dirs = sorted(p for p in data_root.iterdir()
                         if p.is_dir() and (p / "frames.hdf5").exists())
    for i, sample in enumerate(sample_dirs):
        with h5py.File(sample / "frames.hdf5", "r") as f:
            im = np.asarray(f["im"][:, 0], np.float32)          # (4, H, W)
            if args.architecture == "multi_frame":
                amb = np.asarray(f["ambient"][:, 0], np.float32)
                R = np.asarray(f["R"], np.float32)
                t = np.asarray(f["t"], np.float32)

        if args.architecture == "single_frame":
            disp = np.asarray(infer(params, im))
        else:
            tl, (H, W) = 4, im.shape[1:]
            flow = np.zeros((tl, tl, H, W, 2), np.float32)
            with h5py.File(sample / "flow.hdf5", "r") as f:
                for i0 in range(tl):
                    for i1 in range(tl):
                        if i0 != i1:
                            flow[i0, i1] = np.moveaxis(
                                np.asarray(f[f"flow_{i0}{i1}"])[0], 0, -1)
            with h5py.File(sample / "single_frame_disp.hdf5", "r") as f:
                primary = np.asarray(f["disp"][:, 0], np.float32)
            disp = np.asarray(infer(params, im, amb, primary, R, t, flow))

        with h5py.File(sample / f"{args.architecture}_disp.hdf5", "w") as f:
            f.create_dataset("disp", data=disp[:, None])        # (4,1,H,W)
        if i % 50 == 0:
            print(f"{i + 1}/{len(sample_dirs)}: {sample.name}")
    print(f"wrote {args.architecture}_disp.hdf5 for {len(sample_dirs)} samples")


if __name__ == "__main__":
    main()
