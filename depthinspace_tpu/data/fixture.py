"""Procedural structured-light micro-dataset generator (no mesh assets).

Generates fully self-consistent synthetic tracks *analytically* — a slanted
background plane plus floating rectangles, rendered per camera pose with a
projector-pattern projection — so end-to-end training/tests run in-repo
without ShapeNet or the native renderer.  Produces the exact on-disk schema
of the reference generator (frames.hdf5 with im/ambient/grad/disp/R/t,
settings.pkl, flow.hdf5; reference data/create_syn_data.py:147-255,332-341),
with *exact* rigid optical flow derived from the analytic depth (the
reference uses LiteFlowNet offline; for static scenes rigid flow from depth
and poses is the ground truth that flow approximates).

Scene/camera conventions follow the reference: camera-from-world is
X_c = R X_w + t (column convention), the projector sits at t + (-baseline,
0, 0) with the same orientation (reference data/create_syn_data.py:159-212).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import h5py
import cv2

from .settings import Settings, save_settings


def make_dot_pattern(height: int, width: int, n_dots: int = None,
                     seed: int = 7) -> np.ndarray:
    """Random dot projector pattern, (H, W, 3) float32 in [0, 1]."""
    rng = np.random.RandomState(seed)
    if n_dots is None:
        n_dots = height * width // 24
    pat = np.zeros((height, width), np.float32)
    ys = rng.randint(0, height, n_dots)
    xs = rng.randint(0, width, n_dots)
    pat[ys, xs] = 1.0
    pat = cv2.GaussianBlur(pat, (3, 3), 0.6)
    pat = np.clip(pat / max(pat.max(), 1e-6), 0, 1)
    return np.stack([pat] * 3, axis=-1)


def _rotation_for_lookat(target: np.ndarray, eye: np.ndarray) -> np.ndarray:
    """Small rotation turning the optical axis towards (target - eye)."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, 1.0, 0.0]), z)
    if np.linalg.norm(x) < 1e-8:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=0).astype(np.float32)


class PlaneScene:
    """Background plane n.X = c plus axis-aligned floating rectangles."""

    def __init__(self, rng: np.random.RandomState, n_rects: int = 3):
        nx, ny = rng.uniform(-0.25, 0.25, 2)
        self.bg_n = np.array([nx, ny, 1.0], np.float32)
        self.bg_n /= np.linalg.norm(self.bg_n)
        self.bg_c = float(rng.uniform(3.0, 4.5) * self.bg_n[2])
        self.bg_albedo = rng.uniform(0.3, 0.9)
        self.rects = []
        for _ in range(n_rects):
            z = rng.uniform(1.5, 3.0)
            cx, cy = rng.uniform(-1.0, 1.0, 2)
            w, h = rng.uniform(0.3, 1.0, 2)
            albedo = rng.uniform(0.3, 0.95)
            self.rects.append((z, cx - w / 2, cx + w / 2,
                               cy - h / 2, cy + h / 2, albedo))

    def intersect(self, origins: np.ndarray, dirs: np.ndarray):
        """Ray-cast: origins (3,), dirs (P, 3) world-space unit-z-free rays.
        Returns (depth_along_dir (P,), albedo (P,), normal (P, 3))."""
        P = dirs.shape[0]
        best_s = np.full(P, np.inf, np.float32)
        albedo = np.full(P, 0.5, np.float32)
        normal = np.tile(np.array([0, 0, -1], np.float32), (P, 1))

        # background plane
        denom = dirs @ self.bg_n
        s = (self.bg_c - origins @ self.bg_n) / np.where(np.abs(denom) < 1e-9,
                                                         1e-9, denom)
        valid = s > 0
        upd = valid & (s < best_s)
        best_s[upd] = s[upd]
        albedo[upd] = self.bg_albedo
        normal[upd] = -self.bg_n

        # floating rectangles at constant world z
        for (z, x0, x1, y0, y1, alb) in self.rects:
            denom = dirs[:, 2]
            s = (z - origins[2]) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            pt = origins[None, :] + s[:, None] * dirs
            valid = (s > 0) & (pt[:, 0] >= x0) & (pt[:, 0] <= x1) \
                & (pt[:, 1] >= y0) & (pt[:, 1] <= y1)
            upd = valid & (s < best_s)
            best_s[upd] = s[upd]
            albedo[upd] = alb
            normal[upd] = np.array([0, 0, -1], np.float32)

        return best_s, albedo, normal


def _render_frame(scene: PlaneScene, K: np.ndarray, R: np.ndarray,
                  t: np.ndarray, imsize, pattern_cam: np.ndarray,
                  baseline: float, blend: float):
    """Render depth/ambient/IR for one camera pose.

    The projector shares the camera's orientation and sits at
    t_proj = t + (-baseline, 0, 0); the pattern is the camera-space
    remapped pattern (same convention as the reference's settings pattern).
    """
    H, W = imsize
    Ki = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    pix = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3)
    d_cam = pix @ Ki.T                          # rays with z=1 in cam coords
    d_world = d_cam @ R                          # R^T d (column conv.)
    origin = -R.T @ t                            # camera center in world

    s, albedo, normal = scene.intersect(origin.astype(np.float32),
                                        d_world.astype(np.float32))
    depth = s.reshape(H, W)                      # z_cam == s since d_cam_z=1

    # ambient: Lambertian with headlight at the camera
    view = -d_world / np.linalg.norm(d_world, axis=1, keepdims=True)
    lamb = np.abs(np.sum(normal * view, axis=1))
    ambient = (albedo * lamb).reshape(H, W).astype(np.float32)

    # IR: sample the projector pattern at the projected pixel
    Xw = origin[None, :] + s[:, None] * d_world
    t_proj = t + np.array([-baseline, 0, 0], np.float32)
    Xp = Xw @ R.T + t_proj[None, :]
    uvp = Xp @ K.T
    with np.errstate(divide="ignore", invalid="ignore"):
        up = uvp[:, 0] / np.maximum(uvp[:, 2], 1e-9)
        vp = uvp[:, 1] / np.maximum(uvp[:, 2], 1e-9)
    pat = pattern_cam.mean(axis=2)
    ir = cv2.remap(pat, up.reshape(H, W).astype(np.float32),
                   vp.reshape(H, W).astype(np.float32),
                   cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
                   borderValue=0.0)
    ir = (ir * lamb.reshape(H, W)).astype(np.float32)

    im = blend * ir + (1 - blend) * ambient
    return depth.astype(np.float32), ambient, im.astype(np.float32)


def _rigid_flow(depth_i, K, R_i, t_i, R_j, t_j):
    """Exact flow from frame i to frame j for a static scene."""
    H, W = depth_i.shape
    Ki = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    pix = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3)
    Xc = (pix @ Ki.T) * depth_i.reshape(-1, 1)
    Xw = (Xc - t_i[None, :]) @ R_i               # row convention, = R^T(X-t)
    Xj = Xw @ R_j.T + t_j[None, :]
    uvj = Xj @ K.T
    uj = uvj[:, 0] / np.maximum(uvj[:, 2], 1e-9)
    vj = uvj[:, 1] / np.maximum(uvj[:, 2], 1e-9)
    flow = np.stack([uj.reshape(H, W) - u, vj.reshape(H, W) - v], axis=0)
    return flow.astype(np.float32)


def _np_lcn(x, radius, eps):
    k = 2 * radius + 1
    mean = cv2.blur(x, (k, k), borderType=cv2.BORDER_REFLECT)
    sq = cv2.blur(x * x, (k, k), borderType=cv2.BORDER_REFLECT)
    std = np.sqrt(np.clip(sq - mean * mean, 0, None)) + eps
    return (x - mean) / std


def generate_dataset(out_dir, n_samples: int = 4, imsize=(64, 56),
                     track_length: int = 4, seed: int = 42,
                     focal: float = 40.0, baseline: float = 0.025,
                     blend: float = 0.6, write_flow: bool = True,
                     write_sgm: bool = False):
    """Write settings.pkl + per-sample frames.hdf5 (+ flow.hdf5).

    ``write_sgm=True`` additionally writes an ``sgm_disp`` dataset — a noisy,
    partially-invalid (zeroed) copy of the GT disparity standing in for the
    semi-global-matching disparities real captures ship with (reference
    data/dataset.py real branch; consumed by the --data_type real SGM warmup
    loss, reference single_frame_worker.py:157-163)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    H, W = imsize
    K = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]],
                 np.float32)
    pattern = make_dot_pattern(H, W, seed=seed)
    save_settings(out_dir / "settings.pkl",
                  Settings(imsize=imsize, pattern=pattern,
                           baseline=baseline, K=K))

    center = np.array([0, 0, 3.0], np.float32)
    for idx in range(n_samples):
        rng = np.random.RandomState(seed + idx)
        scene = PlaneScene(rng)
        base_jitter = rng.uniform(-0.15, 0.15, 3).astype(np.float32)

        frames = {k: [] for k in ("im", "ambient", "grad", "disp", "R", "t")}
        depths, Rs, ts = [], [], []
        for _ in range(track_length):
            cam_pos = base_jitter + rng.uniform(-0.08, 0.08, 3).astype(np.float32)
            if np.linalg.norm(cam_pos[:2]) < 1e-9:
                Rc = np.eye(3, dtype=np.float32)
            else:
                Rc = _rotation_for_lookat(center, cam_pos)
            tc = (-Rc @ cam_pos).astype(np.float32)

            depth, ambient, im = _render_frame(
                scene, K, Rc, tc, imsize, pattern, baseline, blend)
            disp = baseline * focal / np.maximum(depth, 1e-6)

            sx = cv2.Sobel(ambient, cv2.CV_32F, 1, 0, ksize=5)
            sy = cv2.Sobel(ambient, cv2.CV_32F, 0, 1, ksize=5)
            grad = np.maximum(np.sqrt(sx ** 2 + sy ** 2) - 0.8, 0.0)
            grad = np.clip(_np_lcn(grad, 5, 0.1), 0.0, 1.0)

            frames["im"].append(im[None])
            frames["ambient"].append(ambient[None])
            frames["grad"].append(grad[None])
            frames["disp"].append(disp[None].astype(np.float32))
            frames["R"].append(Rc)
            frames["t"].append(tc)
            depths.append(depth)
            Rs.append(Rc)
            ts.append(tc)

        sample_dir = out_dir / f"{idx:08d}"
        sample_dir.mkdir(exist_ok=True)
        with h5py.File(sample_dir / "frames.hdf5", "w") as f:
            for k, v in frames.items():
                f.create_dataset(k, data=np.stack(v, axis=0))
            if write_sgm:
                disp = np.stack(frames["disp"], axis=0)
                sgm = disp + rng.normal(0, 0.5, disp.shape).astype(np.float32)
                sgm[rng.rand(*sgm.shape) < 0.2] = 0.0    # invalid pixels
                f.create_dataset("sgm_disp", data=np.maximum(sgm, 0.0))

        if write_flow:
            with h5py.File(sample_dir / "flow.hdf5", "w") as f:
                for i in range(track_length):
                    for j in range(track_length):
                        if i != j:
                            fl = _rigid_flow(depths[i], K, Rs[i], ts[i],
                                             Rs[j], ts[j])
                            f.create_dataset(f"flow_{i}{j}", data=fl[None])
    return out_dir
