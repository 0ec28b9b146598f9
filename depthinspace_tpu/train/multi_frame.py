"""DIS-MF worker (reference model/multi_frame_worker.py).

FuseNet over 4-frame tracks; datasets additionally load the DIS-SF primary
disparities (single_frame_disp.hdf5) that seed the fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data import TrackDataset
from ..models import FuseNet
from ..ops import disp_to_depth
from .worker import Worker, TestSet


class MultiFrameWorker(Worker):
    architecture = "multi_frame"

    def make_model(self):
        H, W = self.imsize
        K = tuple(map(tuple, self.settings.K.tolist()))
        return FuseNet(imsize=(H, W), K=K,
                       track_length=self.cfg.track_length,
                       max_disp=self.cfg.max_disp,
                       compute_dtype=jnp.dtype(self.cfg.mf_dtype),
                       use_remat=self.cfg.mf_remat)

    def init_params(self):
        tl = self.cfg.track_length
        H, W = self.imsize
        zeros = jnp.zeros
        return self.model.init(
            jax.random.key(self.cfg.seed),
            zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
            zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
            jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
            zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2)))

    def _dataset(self, paths, train):
        cached = self.cached_dataset(
            paths, train, load_primary=True,
            load_pseudo_gt=(not train) and self.cfg.use_pseudo_gt)
        if cached is not None:
            return cached
        return TrackDataset(
            self.settings, paths, train=train,
            data_aug=train and not self.cfg.device_augment,
            track_length=self.cfg.track_length,
            load_flow=self.cfg.flow_source == "file",
            load_primary=True,
            load_pseudo_gt=(not train) and self.cfg.use_pseudo_gt,
            data_type=self.cfg.data_type)

    def make_train_set(self):
        return self._dataset(self.train_paths, train=True)

    def make_test_sets(self):
        return [TestSet("simple", self._dataset(self.test_paths, train=False),
                        test_frequency=self.cfg.test_frequency)]
