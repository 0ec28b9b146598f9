"""Measure the warp kernels' band-sparsity on REAL pred-flow data.

The Pallas warp kernels skip (dy-group, dx-chunk) enumeration work per
(image, band) from scalar-prefetched flow ranges (ops/pallas/
warp_kernel.py::_warp2d_ranges).  This script computes, on rigid flow
derived from the presaved PRIMARY disparities (the flow_source=pred
regime MF trains in), the fraction of 8x8 (dy, dx) chunk work each
granularity would execute:

  band        current scheme: ranges per (image, band)
  band+dy     gx range per (image, band, dy-group)
  band+dy+col gx range per (image, band, dy-group, column half)

to size the headroom of a finer-grained v3 kernel before building it.

  python scripts/warp_sparsity_stats.py [--samples 8] [--res core|full]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import h5py


def rigid_flow_np(disp, K, baseline, focal, R_i, t_i, R_j, t_j):
    H, W = disp.shape
    depth = baseline * focal / np.maximum(disp, 1e-6)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    Ki = np.linalg.inv(K.astype(np.float64))
    ray = np.stack([u, v, np.ones_like(u)], -1) @ Ki.T
    xyz = depth[..., None] * ray
    xyz = (xyz - t_i) @ R_i          # row-vector: (x - t) @ R = R^T-style
    xc = xyz @ R_j.T + t_j
    uvd = xc @ K.astype(np.float64).T
    uv = uvd[..., :2] / np.maximum(uvd[..., 2:], 1e-9)
    return (uv - np.stack([u, v], -1)).astype(np.float32)


def chunk_work(kx, ky, BH, D):
    """Active-chunk fractions for the three granularities on one image."""
    H, W = kx.shape
    lim = 2 * D + 1
    G = (2 * D + 2) // 8
    n_bands = H // BH
    total = G * G            # (dy-group, dx-chunk) grid per band
    rows = {"band": 0.0, "band+dy": 0.0, "band+dy+col": 0.0}
    for j in range(n_bands):
        kyb = ky[j * BH:(j + 1) * BH]
        kxb = kx[j * BH:(j + 1) * BH]
        valid = (kyb >= -1) & (kyb <= lim) & (kxb >= -1) & (kxb <= lim)
        if not valid.any():
            continue

        def rng(k, m):
            lo = np.clip(k[m].min(), 0, lim) // 8
            hi = np.clip(k[m].max() + 1, 0, lim) // 8
            return lo, hi

        gy0, gy1 = rng(kyb, valid)
        gx0, gx1 = rng(kxb, valid)
        rows["band"] += (gy1 - gy0 + 1) * (gx1 - gx0 + 1)

        for g in range(gy0, gy1 + 1):
            # pixels whose taps touch dy-group g: ky in [8g-1, 8g+8]
            m = valid & (kyb >= 8 * g - 1) & (kyb <= 8 * g + 8)
            if not m.any():
                continue
            x0, x1 = rng(kxb, m)
            rows["band+dy"] += x1 - x0 + 1
            for half in range(2):
                sl = slice(half * W // 2, (half + 1) * W // 2)
                mh = m[:, sl]
                if not mh.any():
                    continue
                x0, x1 = rng(kxb[:, sl], mh)
                rows["band+dy+col"] += x1 - x0 + 1
    denom = n_bands * total
    return {k: v / denom for k, v in rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/root/repo/dataset")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--offset", type=int, default=1024)
    ap.add_argument("--res", default="core", choices=["core", "full"])
    ap.add_argument("--max_shift", type=int, default=16)
    args = ap.parse_args()

    from depthinspace_tpu.data import load_settings
    root = Path(args.data_dir)
    settings = load_settings(root / "settings.pkl")
    K, baseline, focal = settings.K, settings.baseline, settings.focal_length
    dirs = sorted(p for p in root.glob("0*")
                  if (p / "single_frame_disp.hdf5").exists())
    dirs = dirs[args.offset:args.offset + args.samples]
    if not dirs:
        print("no presaved primaries found"); return

    D = args.max_shift  # _effective_shift(16) == 16 -> G = 4 (rounding up)
    BH = 16
    acc = {"band": [], "band+dy": [], "band+dy+col": []}
    rng = np.random.RandomState(0)
    for d in dirs:
        with h5py.File(d / "frames.hdf5", "r") as f:
            R = np.asarray(f["R"], np.float64)
            t = np.asarray(f["t"], np.float64)
            tl = R.shape[0]
        with h5py.File(d / "single_frame_disp.hdf5", "r") as f:
            disp = np.asarray(f["disp"][:tl, 0], np.float32)
        i, j = rng.choice(tl, 2, replace=False)
        fl = rigid_flow_np(disp[i], K, baseline, focal, R[i], t[i], R[j], t[j])
        if args.res == "core":
            fl = fl[::2, ::2] * 0.5
        H, W = fl.shape[:2]
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        x0 = np.floor(u + fl[..., 0]).astype(np.int64)
        y0 = np.floor(v + fl[..., 1]).astype(np.int64)
        kx = (x0 - u + D).astype(np.int64)
        ky = (y0 - v + D).astype(np.int64)
        r = chunk_work(kx, ky, BH, D)
        for k in acc:
            acc[k].append(r[k])
    print(f"res={args.res} max_shift={D} BH={BH}  "
          f"(fraction of full (dy,dx) chunk enumeration executed)")
    for k in acc:
        print(f"  {k:12s} {np.mean(acc[k]):.3f}")


if __name__ == "__main__":
    main()
