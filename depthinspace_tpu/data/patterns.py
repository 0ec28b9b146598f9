"""Projector pattern files + real-capture post-processing.

Pattern handling mirrors the reference conventions (reference
data/data_manipulation.py:53-112): per-type orientation fixes for the
pattern PNGs, and the real-capture crop(128,108)+2x downscale with matching
intrinsics adjustment. Pattern assets are not bundled; point
``pattern_path`` at the reference's PNGs or any projector calibration
image, or use the procedural generator (data/fixture.py:make_dot_pattern).
"""

from __future__ import annotations

import numpy as np
import cv2


def read_pattern_file(pattern_path: str, pattern_type: str = "default",
                      pattern_size=None) -> np.ndarray:
    """Load a projector pattern image -> (H, W, 3) float32 in [0, 1], with
    the reference's per-type orientation handling."""
    pattern = cv2.imread(str(pattern_path))
    if pattern is None:
        raise FileNotFoundError(pattern_path)
    pattern = pattern.astype(np.float32) / 255.0
    if pattern.ndim == 2:
        pattern = np.stack([pattern] * 3, axis=2)

    if pattern_type == "default":
        pattern = np.rot90(np.flip(pattern, axis=1))
    elif pattern_type == "kinect":
        m = min(pattern.shape[:2])
        sh = (pattern.shape[0] - m) // 2
        sw = (pattern.shape[1] - m) // 2
        pattern = pattern[sh:sh + m, sw:sw + m]
        if pattern_size is not None:
            pattern = cv2.resize(pattern, pattern_size,
                                 interpolation=cv2.INTER_LINEAR)
    return np.ascontiguousarray(pattern)


def post_process(pattern_type: str, im: np.ndarray, K=None):
    """Real-capture processing: crop (128, 108) margins then 2x downscale to
    432x512, with intrinsics adjusted accordingly; identity for synthetic."""
    if pattern_type == "real":
        out = im[128:-128, 108:-108, ...].copy()
        out = cv2.resize(out, (432, 512), interpolation=cv2.INTER_LINEAR)
        if K is not None:
            Kp = K.copy()
            Kp[0, 0] /= 2
            Kp[1, 1] /= 2
            Kp[0, 2] = (Kp[0, 2] - 108) / 2
            Kp[1, 2] = (Kp[1, 2] - 128) / 2
            return out, Kp
        return out
    if K is not None:
        return im, K
    return im


def map_pattern_to_camera(pattern: np.ndarray, K_proj: np.ndarray,
                          K: np.ndarray, imsize) -> np.ndarray:
    """Reproject the projector-space pattern onto the camera pixel grid
    (fronto-parallel approximation used for the reference loss pattern,
    reference data/create_syn_data.py:315-330)."""
    H, W = imsize
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    grid = np.stack([u.ravel(), v.ravel(), np.ones(u.size)], axis=0)
    mapped = K_proj @ (np.linalg.inv(K) @ grid)
    mapped = mapped / mapped[2]
    x_map = mapped[0].reshape(H, W).astype(np.float32)
    y_map = mapped[1].reshape(H, W).astype(np.float32)
    return cv2.remap(pattern, x_map, y_map, cv2.INTER_LINEAR)
