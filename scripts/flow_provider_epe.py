"""Endpoint-error table for every flow provider on held-out samples.

Providers (depthinspace_tpu/tools/presave_flow.py + train/objective.py):
  zero      predict no motion (the no-skill floor)
  farneback classical dense flow on the ambient images
  learned   the in-repo FlowNet (output/flownet.msgpack), if present
  pred      rigid flow from the PRESAVED PRIMARY (SF-predicted) disparity
            + poses — the GT-free provider MF training uses
            (flow_source=pred); requires single_frame_disp.hdf5 from a
            presave stage
GT = rigid flow from ground-truth disparity + poses (exact on the static
synthetic scenes).

    python scripts/flow_provider_epe.py [--samples 16] [--offset 512]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import h5py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/root/repo/dataset")
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--offset", type=int, default=512,
                    help="first sample index (512 = test-split start)")
    ap.add_argument("--learned", default="",
                    help="FlowNet msgpack ('' = skip; needs TPU/CPU jax)")
    ap.add_argument("--out", default="/root/repo/output/flow_provider_epe.json")
    args = ap.parse_args()

    from depthinspace_tpu.data import load_settings
    from depthinspace_tpu.tools.presave_flow import rigid_flow, farneback_flow

    root = Path(args.data_dir)
    settings = load_settings(root / "settings.pkl")
    K, baseline, focal = settings.K, settings.baseline, settings.focal_length
    dirs = sorted(p for p in root.glob("0*") if (p / "frames.hdf5").exists())
    dirs = dirs[args.offset:args.offset + args.samples]

    learned_infer, learned_channels = None, 1
    if args.learned and Path(args.learned).exists():
        from depthinspace_tpu.tools.presave_flow import make_learned_infer
        learned_infer, learned_channels = make_learned_infer(
            args.learned, settings.imsize)

    rows = {"zero": [], "farneback": [], "learned": [], "pred": []}
    rng = np.random.RandomState(12345)
    for d in dirs:
        with h5py.File(d / "frames.hdf5", "r") as f:
            tl = f["im"].shape[0]
            i, j = rng.choice(tl, size=2, replace=False)
            amb_i = np.asarray(f["ambient"][i, 0], np.float32)
            amb_j = np.asarray(f["ambient"][j, 0], np.float32)
            im_i = np.asarray(f["im"][i, 0], np.float32)
            im_j = np.asarray(f["im"][j, 0], np.float32)
            disp_gt = np.asarray(f["disp"][i, 0], np.float32)
            R = np.asarray(f["R"], np.float32)
            t = np.asarray(f["t"], np.float32)
        depth_gt = baseline * focal / np.maximum(disp_gt, 1e-6)
        gt = rigid_flow(depth_gt, K, R[i], t[i], R[j], t[j])      # (2,H,W)
        epe = lambda fl: float(np.mean(np.linalg.norm(fl - gt, axis=0)))

        rows["zero"].append(epe(np.zeros_like(gt)))
        rows["farneback"].append(epe(farneback_flow(amb_i, amb_j)))
        if learned_infer is not None:
            if learned_channels == 2:
                a = np.stack([amb_i, im_i], axis=-1)[None]
                b_ = np.stack([amb_j, im_j], axis=-1)[None]
            else:
                a, b_ = amb_i[None, ..., None], amb_j[None, ..., None]
            rows["learned"].append(epe(np.asarray(learned_infer(a, b_))[0]))

        primary_path = d / "single_frame_disp.hdf5"
        if primary_path.exists():
            with h5py.File(primary_path, "r") as f:
                disp_p = np.asarray(f["disp"][i, 0], np.float32)
            depth_p = baseline * focal / np.maximum(disp_p, 1e-6)
            rows["pred"].append(
                epe(rigid_flow(depth_p, K, R[i], t[i], R[j], t[j])))

    out = {}
    print(f"flow-provider mean EPE over {len(dirs)} held-out pairs "
          f"(samples {args.offset}..{args.offset + args.samples - 1}):")
    for name, vals in rows.items():
        if vals:
            out[name] = round(float(np.mean(vals)), 3)
            print(f"  {name:10s} {out[name]:7.3f} px")
        else:
            print(f"  {name:10s} (no data — run a presave stage first)")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
