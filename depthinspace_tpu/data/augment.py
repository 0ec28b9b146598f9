"""Per-frame image augmentation with disparity correction.

Same augmentation menu as the reference (reference data/data_manipulation.py:
114-195): optional shear/shift affine whose horizontal displacement is *added
to the disparity map* (a horizontal image shift is exactly a disparity
offset), Gaussian blur (p=0.5), per-pixel Gaussian noise, salt & pepper
noise (p=0.5), and a final clip to [0, 1].  The training defaults disable
the affine part (max_shift=0, reference data/dataset.py:67-70).
"""

from __future__ import annotations

import numpy as np
import cv2


def augment_frame(img: np.ndarray, rng: np.random.RandomState,
                  amb: np.ndarray | None = None,
                  disp: np.ndarray | None = None,
                  primary_disp: np.ndarray | None = None,
                  sgm_disp: np.ndarray | None = None,
                  grad: np.ndarray | None = None,
                  max_shift: float = 64.0, max_blur: float = 1.5,
                  max_noise: float = 10.0, max_sp_noise: float = 0.001):
    """Augment one (H, W) frame and its aligned maps. Returns the augmented
    (img, amb, disp, primary_disp, sgm_disp, grad) tuple (None passthrough)."""
    min_val = float(np.min(img))
    max_val = float(np.max(img))

    out_img = img
    out_amb = amb
    out_disp = disp
    out_pdisp = primary_disp
    out_sgm = sgm_disp
    out_grad = grad

    if max_shift > 1:
        rows, cols = img.shape
        shear, shift = 0.0, 0.0
        if rng.uniform(0, 1) < 0.75:
            shear = rng.uniform(-max_shift, max_shift)
        else:
            shift = rng.uniform(-max_shift / 2, max_shift)
        shear_correction = -shear if shear < 0 else 0.0
        a = shear / float(rows)
        b = shift + shear_correction
        T = np.float32([[1, a, b], [0, 1, 0]])
        out_img = cv2.warpAffine(out_img, T, (cols, rows))
        if amb is not None:
            out_amb = cv2.warpAffine(out_amb, T, (cols, rows))
        if grad is not None:
            out_grad = cv2.warpAffine(grad, T, (cols, rows))
        # horizontal displacement per row == disparity delta
        col = a * np.arange(rows) + b
        disp_delta = np.tile(col, (cols, 1)).T
        if disp is not None:
            out_disp = cv2.warpAffine(disp + disp_delta, T, (cols, rows))
        if primary_disp is not None:
            out_pdisp = cv2.warpAffine(primary_disp + disp_delta, T, (cols, rows))
        if sgm_disp is not None:
            out_sgm = cv2.warpAffine(sgm_disp + disp_delta, T, (cols, rows))

    if rng.uniform(0, 1) < 0.5:
        sigma = rng.uniform(0.2, max_blur)
        out_img = cv2.GaussianBlur(out_img, (5, 5), sigma)
        if amb is not None:
            out_amb = cv2.GaussianBlur(out_amb, (5, 5), rng.uniform(0.2, max_blur))

    out_img = out_img + rng.randn(*out_img.shape) * rng.uniform(0.0, max_noise) / 255.0
    if amb is not None:
        out_amb = out_amb + rng.randn(*out_amb.shape) * rng.uniform(0.0, max_noise) / 255.0

    if rng.uniform(0, 1) < 0.5:
        ratio = rng.uniform(0.0, max_sp_noise)
        shape = out_img.shape
        flat = out_img.flatten()
        coord = rng.choice(flat.size, int(flat.size * ratio))
        flat[coord] = max_val
        coord = rng.choice(flat.size, int(flat.size * ratio))
        flat[coord] = min_val
        out_img = flat.reshape(shape)

    out_img = np.clip(out_img, 0.0, 1.0)
    if amb is not None:
        out_amb = np.clip(out_amb, 0.0, 1.0)

    return out_img, out_amb, out_disp, out_pdisp, out_sgm, out_grad
