"""Pre-save optical flow for every ordered frame pair of every track.

  python -m depthinspace_tpu.tools.presave_flow --provider rigid
  python -m depthinspace_tpu.tools.presave_flow --provider farneback

Writes ``<sample>/flow.hdf5`` with datasets flow_{i}{j} of shape
(1, 2, H, W) — the schema consumed by the datasets (reference
data/dataset.py:112-117).

The reference shells out to a forked pytorch-liteflownet
(data/presave_optical_flow_data.py:40-43) and its README notes any flow
method may substitute (README.md:46-47).  This tool implements a pluggable
provider interface with two in-repo providers:

- ``rigid``:     exact flow from the ground-truth depth + camera poses
                 (static scenes => rigid flow IS the true optical flow;
                 exact for synthetic data, no network needed);
- ``farneback``: classical dense flow (cv2.calcOpticalFlowFarneback) on the
                 ambient images, for real captures without ground truth;
- ``learned``:   the in-repo JAX FlowNet (models/flownet.py) trained on
                 renderer output with exact rigid-flow labels
                 (tools/train_flow.py) — the capability replacement for the
                 reference's LiteFlowNet checkpoint; pass ``--flow_params``;
- precomputed flow.hdf5 files from any external method (e.g. LiteFlowNet)
  are consumed as-is by the dataset — no conversion needed.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import h5py
import cv2

from ..config import load_paths
from ..data import load_settings


def rigid_flow(depth_i, K, R_i, t_i, R_j, t_j):
    """Exact static-scene flow i->j from depth + poses (same math as the
    geometric loss reprojection, ops/geometry.py)."""
    H, W = depth_i.shape
    Ki = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    pix = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3)
    Xc = (pix @ Ki.T) * depth_i.reshape(-1, 1)
    Xw = (Xc - t_i[None, :]) @ R_i
    Xj = Xw @ R_j.T + t_j[None, :]
    uvj = Xj @ K.T
    uj = uvj[:, 0] / np.maximum(uvj[:, 2], 1e-9)
    vj = uvj[:, 1] / np.maximum(uvj[:, 2], 1e-9)
    return np.stack([uj.reshape(H, W) - u, vj.reshape(H, W) - v], axis=0)


def farneback_flow(img_i, img_j):
    a = (np.clip(img_i, 0, 1) * 255).astype(np.uint8)
    b = (np.clip(img_j, 0, 1) * 255).astype(np.uint8)
    flow = cv2.calcOpticalFlowFarneback(
        a, b, None, pyr_scale=0.5, levels=4, winsize=21, iterations=5,
        poly_n=7, poly_sigma=1.5, flags=cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
    return np.moveaxis(flow, -1, 0)          # (2, H, W)


def make_learned_infer(params_path: str, imsize):
    """Jitted batched FlowNet inference: (P,H,W) pairs -> (P,2,H,W) flow."""
    import jax
    import jax.numpy as jnp
    from .train_flow import load_flow_params
    from ..models.flownet import FlowNet

    params, n_ch = load_flow_params(params_path, imsize)
    net = FlowNet()

    @jax.jit
    def infer(a, b):
        # a/b: (P, H, W, C) with C = the net's trained input channels
        out = net.apply(params, a, b)[-1]
        return jnp.moveaxis(out, -1, 1)           # (P, 2, H, W)

    return infer, n_ch


def process_sample(sample: Path, provider: str, K, baseline, focal,
                   learned_infer=None, learned_channels: int = 1):
    with h5py.File(sample / "frames.hdf5", "r") as f:
        tl = f["im"].shape[0]
        amb = np.asarray(f["ambient"][:, 0], np.float32)
        im = (np.asarray(f["im"][:, 0], np.float32)
              if learned_channels == 2 else None)
        if provider == "rigid":
            disp = np.asarray(f["disp"][:, 0], np.float32)
            R = np.asarray(f["R"], np.float32)
            t = np.asarray(f["t"], np.float32)
            depth = baseline * focal / np.maximum(disp, 1e-6)

    pairs = [(i, j) for i in range(tl) for j in range(tl) if i != j]
    if provider == "learned":
        # all ordered pairs in one batched device call; channels must match
        # the checkpoint's trained input (models/flownet.py::flow_input)
        def x(k):
            if learned_channels == 2:
                return np.stack([amb[k], im[k]], axis=-1)
            return amb[k][..., None]
        a = np.stack([x(i) for i, _ in pairs])
        b = np.stack([x(j) for _, j in pairs])
        flows = np.asarray(learned_infer(a, b))

    with h5py.File(sample / "flow.hdf5", "w") as f:
        for p, (i, j) in enumerate(pairs):
            if provider == "rigid":
                fl = rigid_flow(depth[i], K, R[i], t[i], R[j], t[j])
            elif provider == "farneback":
                fl = farneback_flow(amb[i], amb[j])
            elif provider == "learned":
                fl = flows[p]
            else:
                raise ValueError(provider)
            f.create_dataset(f"flow_{i}{j}",
                             data=fl[None].astype(np.float32))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--provider", default="rigid",
                    choices=["rigid", "farneback", "learned"])
    ap.add_argument("--flow_params", default=None,
                    help="FlowNet params (train_flow.py output); required "
                         "for --provider learned")
    ap.add_argument("--data_dir", default=None)
    args = ap.parse_args(argv)

    paths = load_paths()
    data_root = Path(args.data_dir or paths["DATA_DIR"])
    settings = load_settings(data_root / "settings.pkl")

    learned_infer, learned_channels = None, 1
    if args.provider == "learned":
        params_path = args.flow_params or str(
            Path(paths["OUTPUT_DIR"]) / "flownet.msgpack")
        learned_infer, learned_channels = make_learned_infer(
            params_path, settings.imsize)

    sample_dirs = sorted(p for p in data_root.iterdir()
                         if p.is_dir() and (p / "frames.hdf5").exists())
    for i, sample in enumerate(sample_dirs):
        process_sample(sample, args.provider, settings.K,
                       settings.baseline, settings.focal_length,
                       learned_infer=learned_infer,
                       learned_channels=learned_channels)
        if i % 100 == 0:
            print(f"{i + 1}/{len(sample_dirs)}")
    print(f"wrote flow.hdf5 ({args.provider}) for {len(sample_dirs)} samples")


if __name__ == "__main__":
    main()
