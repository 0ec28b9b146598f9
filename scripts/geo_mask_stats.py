"""Geometric-loss mask acceptance vs flow provider (VERDICT r3 weak 7).

The SF/MF flow-consistency losses gate every pixel behind no-grad masks
(fb: forward-backward flow agreement < ~0.7 px; vc: ambient match < 0.01;
rf: primary-depth round-trip < 1 px — reference model/networks.py:642-649,
591-595).  A flow provider with multi-pixel EPE can silently zero the
geometric gradient: the fb check alone rejects any pixel where the f01/f10
estimates disagree by more than ~a pixel.  This script measures, on real
dataset samples, the accept fraction of each mask for each provider:

  rigid  — GT-depth-derived flow (exact on static scenes; upper bound)
  pred   — rigid flow from the presaved PRIMARY (SF-predicted) disparity
           (the flow_source=pred provider; needs single_frame_disp.hdf5)
  net    — the trained FlowNet (output/flownet.msgpack)
  zero   — all-zeros flow (no-skill floor)

Usage:
  python scripts/geo_mask_stats.py [--samples 8] [--offset 1024] [--out F]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/root/repo/dataset")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--offset", type=int, default=1024)
    ap.add_argument("--flow_params",
                    default="/root/repo/output/flownet.msgpack")
    ap.add_argument("--out", default="/root/repo/output/geo_mask_stats.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from depthinspace_tpu.data import TrackDataset, load_settings
    from depthinspace_tpu.data.dataset import collate
    from depthinspace_tpu.losses.geometric import (CameraGeometry,
                                                   geometric_loss_sf,
                                                   geometric_loss_mf)
    from depthinspace_tpu.ops import disp_to_depth
    from depthinspace_tpu.train.objective import rigid_flow_device
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache

    enable_compilation_cache()
    data_dir = Path(args.data_dir)
    settings = load_settings(data_dir / "settings.pkl")
    paths = sorted(str(p) for p in data_dir.glob("0*/"))
    paths = paths[args.offset:args.offset + args.samples]
    dset = TrackDataset(settings, paths, train=False, data_aug=False,
                        load_flow=False)
    b = collate([dset[i] for i in range(len(paths))])

    H, W = settings.imsize
    cam = CameraGeometry.create(settings.K, H, W)
    depth = disp_to_depth(jnp.asarray(b.disp_gt), settings.focal_length,
                          settings.baseline)
    R, t = jnp.asarray(b.R), jnp.asarray(b.t)
    amb = jnp.asarray(b.ambient)

    flows = {}
    flows["rigid"] = rigid_flow_device(cam, jnp.asarray(b.disp_gt), R, t,
                                       settings.focal_length,
                                       settings.baseline)
    flows["zero"] = jnp.zeros_like(flows["rigid"])
    # "pred": rigid flow from the presaved PRIMARY (SF-predicted) disparity
    # — the flow_source=pred provider (train/objective.py)
    if all((Path(p) / "single_frame_disp.hdf5").exists() for p in paths):
        import h5py
        tl = b.R.shape[0]
        prim = []
        for p in paths:
            with h5py.File(Path(p) / "single_frame_disp.hdf5", "r") as f:
                prim.append(np.asarray(f["disp"][:tl, 0], np.float32))
        prim = jnp.asarray(np.stack(prim, axis=1))      # (tl, N, H, W)
        flows["pred"] = rigid_flow_device(cam, prim, R, t,
                                          settings.focal_length,
                                          settings.baseline)
    if Path(args.flow_params).exists():
        from depthinspace_tpu.models.flownet import FlowNet, flow_all_pairs
        from depthinspace_tpu.tools.train_flow import load_flow_params
        params, in_ch = load_flow_params(Path(args.flow_params),
                                         settings.imsize)
        flows["net"] = flow_all_pairs(FlowNet(), params, jnp.asarray(b.im),
                                      amb, in_ch)

    @jax.jit
    def stats_of(flow):
        _, sf = geometric_loss_sf(cam, depth, R, t, flow, amb,
                                  with_stats=True)
        _, mf = geometric_loss_mf(cam, depth, R, t, flow, amb, depth,
                                  with_stats=True)
        return sf, mf

    report = {}
    for name, fl in flows.items():
        sf, mf = jax.tree.map(float, jax.device_get(stats_of(fl)))
        # EPE vs the rigid (exact) flow, off-diagonal pairs only
        d = np.asarray(fl) - np.asarray(flows["rigid"])
        tl = d.shape[0]
        off = ~np.eye(tl, dtype=bool)
        epe = float(np.mean(np.linalg.norm(d[off], axis=-1)))
        report[name] = {"epe_vs_rigid": round(epe, 3),
                        "sf": {k: round(v, 4) for k, v in sf.items()},
                        "mf": {k: round(v, 4) for k, v in mf.items()}}
        print(f"{name:6s} epe={epe:7.3f}  "
              f"sf_accept={sf['accept']:.4f} (fb {sf['fb']:.3f} vc "
              f"{sf['vc']:.3f})  mf_accept={mf['accept']:.4f} "
              f"(rf {mf['rf']:.3f})", flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
