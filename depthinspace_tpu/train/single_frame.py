"""DIS-SF / DIS-FTSF worker (reference model/single_frame_worker.py).

Single-frame U-Net; train/test datasets load optical flow (no primary
disparity); ``use_pseudo_gt`` adds the DIS-FTSF pseudo-ground-truth L1
term sourced from multi_frame_disp.hdf5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data import TrackDataset
from ..models import DispNet
from .worker import Worker, TestSet


class SingleFrameWorker(Worker):
    architecture = "single_frame"

    def make_model(self):
        return DispNet(max_disp=self.cfg.max_disp)

    def init_params(self):
        H, W = self.imsize
        return self.model.init(jax.random.key(self.cfg.seed),
                               jnp.zeros((1, H, W, 2)))

    def _dataset(self, paths, train):
        cached = self.cached_dataset(paths, train,
                                     load_pseudo_gt=self.cfg.use_pseudo_gt)
        if cached is not None:
            return cached
        return TrackDataset(
            self.settings, paths, train=train,
            data_aug=train and not self.cfg.device_augment,
            track_length=self.cfg.track_length,
            load_flow=self.cfg.flow_source == "file",
            load_primary=False, load_pseudo_gt=self.cfg.use_pseudo_gt,
            data_type=self.cfg.data_type)

    def make_train_set(self):
        return self._dataset(self.train_paths, train=True)

    def make_test_sets(self):
        return [TestSet("simple", self._dataset(self.test_paths, train=False),
                        test_frequency=self.cfg.test_frequency)]
