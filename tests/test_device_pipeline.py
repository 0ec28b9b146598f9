"""Device-side data pipeline: in-graph augmentation and rigid flow.

This host has a single CPU core, so the reference's per-sample cv2/numpy
augmentation (reference data/data_manipulation.py:114-195) and the 21 MB/
sample flow.hdf5 reads starve the accelerator. Both moved in-graph; these
tests pin them to the host implementations they replace.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.losses import CameraGeometry
from depthinspace_tpu.train.objective import (LossContext, make_loss_context,
                                              augment_batch_device,
                                              rigid_flow_device, _gauss_blur5)


def test_gauss_blur5_matches_cv2():
    import cv2
    rng = np.random.RandomState(0)
    x = rng.rand(3, 32, 40).astype(np.float32)
    for sigma in (0.3, 0.5, 1.2):
        ours = np.asarray(_gauss_blur5(jnp.asarray(x),
                                       jnp.full((3, 1, 1), sigma)))
        ref = np.stack([cv2.GaussianBlur(x[i], (5, 5), sigma)
                        for i in range(3)])
        np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_rigid_flow_device_matches_offline_provider():
    from depthinspace_tpu.tools.presave_flow import rigid_flow
    rng = np.random.RandomState(1)
    H, W, tl, bs = 24, 32, 4, 2
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    cam = CameraGeometry.create(K, H, W)
    focal, baseline = 30.0, 0.025
    disp = rng.uniform(0.2, 2.0, (tl, bs, H, W)).astype(np.float32)

    R = np.zeros((tl, bs, 3, 3), np.float32)
    t = rng.uniform(-0.05, 0.05, (tl, bs, 3)).astype(np.float32)
    for i in range(tl):
        for b in range(bs):
            a = rng.uniform(-0.05, 0.05)
            c, s = np.cos(a), np.sin(a)
            R[i, b] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    out = np.asarray(rigid_flow_device(cam, jnp.asarray(disp),
                                       jnp.asarray(R), jnp.asarray(t),
                                       focal, baseline))
    for b in range(bs):
        depth = baseline * focal / np.maximum(disp[:, b], 1e-6)
        for i in range(tl):
            for j in range(tl):
                if i == j:
                    assert np.all(out[i, j, b] == 0)
                    continue
                ref = rigid_flow(depth[i], K, R[i, b], t[i, b],
                                 R[j, b], t[j, b])          # (2, H, W)
                np.testing.assert_allclose(
                    out[i, j, b], np.moveaxis(ref, 0, -1),
                    rtol=1e-4, atol=2e-3)


def _tiny_batch(rng, tl=4, bs=2, H=16, W=16):
    from depthinspace_tpu.data.dataset import Batch
    return Batch(
        im=rng.rand(tl, bs, H, W).astype(np.float32),
        ambient=rng.rand(tl, bs, H, W).astype(np.float32),
        disp_gt=rng.uniform(1, 5, (tl, bs, H, W)).astype(np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (tl, bs, 3, 3)).copy(),
        t=rng.uniform(-0.01, 0.01, (tl, bs, 3)).astype(np.float32),
    )


def test_augment_batch_device_properties():
    rng = np.random.RandomState(2)
    batch = _tiny_batch(rng)
    ctx = LossContext(cam=None, pattern_lcn=None, focal_length=16.0,
                      baseline=0.025, track_length=4, augment=True)
    out1 = augment_batch_device(batch, jax.random.key(0), ctx)
    out2 = augment_batch_device(batch, jax.random.key(0), ctx)
    out3 = augment_batch_device(batch, jax.random.key(1), ctx)

    # deterministic per key, varies across keys
    np.testing.assert_array_equal(np.asarray(out1.im), np.asarray(out2.im))
    assert not np.array_equal(np.asarray(out1.im), np.asarray(out3.im))
    # ranges clipped; non-image leaves untouched
    assert float(jnp.min(out1.im)) >= 0.0 and float(jnp.max(out1.im)) <= 1.0
    assert float(jnp.min(out1.ambient)) >= 0.0
    np.testing.assert_array_equal(np.asarray(out1.disp_gt), batch.disp_gt)
    # noise actually applied (im differs from input somewhere)
    assert not np.array_equal(np.asarray(out1.im), batch.im)


def test_rigid_flow_step_matches_file_flow_step(tmp_path):
    """A fixture's flow.hdf5 IS rigid flow — the eval losses must agree
    between flow_source='file' and flow_source='rigid'."""
    import optax
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.train import TrainState, build_steps

    generate_dataset(tmp_path, n_samples=2, imsize=(32, 32), seed=9)
    settings = load_settings(tmp_path / "settings.pkl")
    paths = sorted(str(p) for p in tmp_path.glob("0*"))
    ds = TrackDataset(settings, paths, train=False, load_flow=True)
    batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))

    model = DispNet(max_disp=128.0)
    opt = optax.adam(1e-4)
    H, W = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))

    ctx_file = make_loss_context(settings, track_length=4)
    ctx_rigid = ctx_file._replace(flow_source="rigid")
    _, eval_file = build_steps(model, ctx_file, opt, "single_frame", None)
    _, eval_rigid = build_steps(model, ctx_rigid, opt, "single_frame", None)

    _, comps_file = eval_file(params, batch, jnp.asarray(0.0))
    _, comps_rigid = eval_rigid(params, batch._replace(flow=None),
                                jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(comps_file),
                               np.asarray(comps_rigid), rtol=2e-3, atol=1e-5)
