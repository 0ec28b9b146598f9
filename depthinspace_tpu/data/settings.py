"""Dataset settings contract (settings.pkl).

Keeps the reference's on-disk schema (reference data/create_syn_data.py:
332-341): a pickle with {'imsize': (H, W), 'pattern': HxWx3 float image,
'baseline': float, 'K': 3x3 intrinsics} at DATA_DIR/settings.pkl.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class Settings:
    imsize: tuple[int, int]
    pattern: np.ndarray          # (H, W, 3) float32 in [0, 1]
    baseline: float
    K: np.ndarray                # (3, 3) float32

    @property
    def focal_length(self) -> float:
        return float(self.K[0, 0])

    def K_at_scale(self, sidx: int) -> np.ndarray:
        """Intrinsics of the sidx-th pyramid level (reference
        data/dataset.py:190-193)."""
        K = self.K.copy() / (2 ** sidx)
        K[2, 2] = 1
        return K

    def imsize_at_scale(self, sidx: int) -> tuple[int, int]:
        return (self.imsize[0] // (2 ** sidx), self.imsize[1] // (2 ** sidx))

    def focal_length_at_scale(self, sidx: int) -> float:
        """Per-level focal length (reference data/dataset.py:63)."""
        return float(self.K[0, 0]) / (2 ** sidx)

    def pattern_at_scale(self, sidx: int) -> np.ndarray:
        """Projector pattern resized to the sidx-th pyramid level with the
        reference's interpolation (reference data/dataset.py:57-60)."""
        if sidx == 0:
            return self.pattern
        import cv2

        h, w = self.imsize_at_scale(sidx)
        return cv2.resize(self.pattern, (w, h),
                          interpolation=cv2.INTER_LINEAR).astype(np.float32)

    def pattern_gray(self) -> np.ndarray:
        """Channel-mean single-channel pattern (reference
        model/networks.py:344)."""
        return self.pattern.mean(axis=2).astype(np.float32)


def load_settings(path: str | Path) -> Settings:
    with open(str(path), "rb") as f:
        d = pickle.load(f)
    return Settings(imsize=tuple(d["imsize"]),
                    pattern=np.asarray(d["pattern"], np.float32),
                    baseline=float(d["baseline"]),
                    K=np.asarray(d["K"], np.float32))


def save_settings(path: str | Path, s: Settings) -> None:
    d = {"imsize": tuple(s.imsize), "pattern": np.asarray(s.pattern, np.float32),
         "baseline": float(s.baseline), "K": np.asarray(s.K, np.float32)}
    with open(str(path), "wb") as f:
        pickle.dump(d, f, pickle.HIGHEST_PROTOCOL)
