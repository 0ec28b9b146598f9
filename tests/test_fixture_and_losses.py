"""Integration tests: procedural fixture data + loss semantics.

The fixture renderer produces *geometrically exact* data, so:
- the SF/MF geometric losses evaluated at ground-truth depth must be ~0;
- the photometric loss at ground-truth disparity must beat perturbed
  disparity (self-supervision signal points the right way);
- the dataset/loader round-trips the HDF5 schema.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.losses import (CameraGeometry, geometric_loss_sf,
                                     geometric_loss_mf, photometric_loss,
                                     smoothness_loss)
from depthinspace_tpu.ops import lcn, disp_to_depth


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("micro_ds")
    generate_dataset(d, n_samples=3, imsize=(64, 56), seed=11)
    return d


@pytest.fixture(scope="module")
def batch_and_settings(fixture_dir):
    settings = load_settings(fixture_dir / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in fixture_dir.glob("0*")),
                      train=False, load_flow=True)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    return batch, settings


def test_dataset_shapes(batch_and_settings):
    batch, settings = batch_and_settings
    tl, bs = 4, 2
    H, W = settings.imsize
    assert batch.im.shape == (tl, bs, H, W)
    assert batch.ambient.shape == (tl, bs, H, W)
    assert batch.disp_gt.shape == (tl, bs, H, W)
    assert batch.R.shape == (tl, bs, 3, 3)
    assert batch.t.shape == (tl, bs, 3)
    assert batch.flow.shape == (tl, tl, bs, H, W, 2)
    assert batch.im.dtype == np.float32


def test_pyramid_surface(fixture_dir):
    """Per-scale getK / focal / pattern parity surface (reference
    data/dataset.py:56-63,190-193)."""
    settings = load_settings(fixture_dir / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in fixture_dir.glob("0*")),
                      train=False)
    for s in range(4):
        K = ds.getK(s)
        np.testing.assert_allclose(K[0, 0], settings.K[0, 0] / 2 ** s)
        np.testing.assert_allclose(K[:2, 2], settings.K[:2, 2] / 2 ** s)
        assert K[2, 2] == 1.0  # reference re-pins the homogeneous 1
        assert settings.focal_length_at_scale(s) == K[0, 0]
        h, w = settings.imsize_at_scale(s)
        assert settings.pattern_at_scale(s).shape == (h, w, 3)


def test_geometric_loss_zero_at_gt(batch_and_settings):
    batch, settings = batch_and_settings
    H, W = settings.imsize
    cam = CameraGeometry.create(settings.K, H, W)
    depth = disp_to_depth(jnp.asarray(batch.disp_gt), settings.focal_length,
                          settings.baseline)
    flow = jnp.asarray(batch.flow)
    amb = jnp.asarray(batch.ambient)
    R = jnp.asarray(batch.R)
    t = jnp.asarray(batch.t)

    # 6 pairs x 2 directions, each a masked mean of |depth diff| in meters.
    # At the coarse 64x56 fixture resolution the depth gradient is steep
    # (~0.075 m/px), so bilinear interpolation of the hyperbolic depth
    # profile leaves ~1 cm residual; at the real 512x432 resolution this
    # shrinks quadratically.  The tolerance reflects that.
    val = float(geometric_loss_sf(cam, depth, R, t, flow, amb))
    assert val < 0.15, val

    val_mf = float(geometric_loss_mf(cam, depth, R, t, flow, amb, depth))
    assert val_mf < 0.3, val_mf

    # a corrupted depth must score clearly worse (clamp=0.1 saturates the
    # per-pixel diff, so the ratio is bounded)
    bad = float(geometric_loss_sf(cam, depth * 1.2, R, t, flow, amb))
    assert bad > 1.3 * val


def test_photometric_loss_prefers_gt(batch_and_settings):
    batch, settings = batch_and_settings
    tl, bs = batch.im.shape[:2]
    H, W = settings.imsize
    im = jnp.asarray(batch.im.reshape(tl * bs, H, W))
    disp = jnp.asarray(batch.disp_gt.reshape(tl * bs, H, W))
    im_lcn, im_std = lcn(im, 5, 0.05)
    pat_lcn, _ = lcn(jnp.asarray(settings.pattern_gray()), 5, 0.05)

    good, _ = photometric_loss(disp, im_lcn, pat_lcn, std=im_std)
    off, _ = photometric_loss(disp + 4.0, im_lcn, pat_lcn, std=im_std)
    assert float(good) < float(off)


def test_smoothness_loss_behaviour():
    rng = np.random.RandomState(0)
    flat = jnp.asarray(np.full((1, 32, 32), 7.0, np.float32))
    rough = jnp.asarray(rng.rand(1, 32, 32).astype(np.float32) * 10)
    amb = jnp.asarray(np.full((1, 32, 32), 0.5, np.float32))
    assert float(smoothness_loss(flat, amb)) < 1e-6
    assert float(smoothness_loss(rough, amb)) > 0.01
