"""flow_source="pred": in-graph rigid flow from PREDICTED disparity.

The GT-free provider for static scenes (train/objective.py::LossContext.
flow_source): SF derives correspondences from the live stop-gradient
prediction, MF from the presaved primary disparities.  Checks:
  - the SF train/eval steps run and produce finite losses with no flow in
    the batch at all;
  - pred flow == rigid (GT) flow when the predicted disparity equals GT
    (provider consistency);
  - the MF step consumes primary-derived flow and runs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.data import TrackDataset, load_settings, generate_dataset
from depthinspace_tpu.data.dataset import collate
from depthinspace_tpu.data.wire import encode_batch
from depthinspace_tpu.models import DispNet, FuseNet
from depthinspace_tpu.parallel import put_batch
from depthinspace_tpu.train.objective import (make_loss_context,
                                              rigid_flow_device)
from depthinspace_tpu.train.steps import build_steps
from depthinspace_tpu.train.state import TrainState


@pytest.fixture(scope="module")
def fixture_batch(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds") / "ds"
    generate_dataset(d, n_samples=2, imsize=(64, 56), seed=5)
    settings = load_settings(d / "settings.pkl")
    paths = sorted(str(p) for p in d.glob("0*"))
    dset = TrackDataset(settings, paths, train=False, data_aug=False,
                        load_flow=False)
    batch = collate([dset[i] for i in range(2)])
    return settings, batch


def test_sf_pred_flow_step_runs(fixture_batch):
    settings, batch = fixture_batch
    assert batch.flow is None          # no flow anywhere on the host path
    dev = put_batch(encode_batch(batch), None)
    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, flow_source="pred",
                            augment=False)
    opt = optax.adam(1e-4)
    train_step, eval_step = build_steps(model, ctx, opt, "single_frame")
    H, W = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(0))
    epoch = jnp.asarray(0.0, jnp.float32)
    state, comps = train_step(state, dev, epoch)
    comps = np.asarray(comps)
    assert np.all(np.isfinite(comps)) and comps.shape[0] == 6
    _, ecomps = eval_step(state.params, dev, epoch)
    assert np.all(np.isfinite(np.asarray(ecomps)))


def test_pred_flow_matches_rigid_at_gt(fixture_batch):
    settings, batch = fixture_batch
    ctx = make_loss_context(settings, track_length=4, flow_source="pred")
    disp = jnp.asarray(batch.disp_gt)
    R, t = jnp.asarray(batch.R), jnp.asarray(batch.t)
    f_gt = rigid_flow_device(ctx.cam, disp, R, t, ctx.focal_length,
                             ctx.baseline)
    f_pred = rigid_flow_device(ctx.cam, disp + 0.0, R, t, ctx.focal_length,
                               ctx.baseline)
    np.testing.assert_allclose(np.asarray(f_gt), np.asarray(f_pred))
    # and a perturbed prediction moves the flow (it is really derived
    # from the disparity argument)
    f_off = rigid_flow_device(ctx.cam, disp + 1.0, R, t, ctx.focal_length,
                              ctx.baseline)
    assert float(jnp.max(jnp.abs(f_off - f_gt))) > 1e-3


def test_mf_pred_flow_step_runs(fixture_batch):
    settings, batch = fixture_batch
    # primary = GT + noise stands in for presaved SF predictions
    rng = np.random.RandomState(0)
    primary = batch.disp_gt + rng.randn(*batch.disp_gt.shape).astype(
        np.float32) * 0.5
    batch = batch._replace(primary_disp=np.maximum(primary, 0.1))
    dev = put_batch(encode_batch(batch), None)
    H, W = settings.imsize
    K = tuple(map(tuple, settings.K.tolist()))
    model = FuseNet(imsize=(H, W), K=K, track_length=4, block_num=1,
                    channels=8, max_disp=128.0, use_remat=False)
    ctx = make_loss_context(settings, track_length=4, flow_source="pred")
    opt = optax.adam(1e-4)
    train_step, eval_step = build_steps(model, ctx, opt, "multi_frame")
    tl, bs = batch.im.shape[:2]
    zeros = jnp.zeros
    params = model.init(
        jax.random.key(0), zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
        zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), zeros((tl, 1, 3)),
        zeros((tl, tl, 1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(0))
    state, comps = train_step(state, dev, jnp.asarray(0.0))
    assert np.all(np.isfinite(np.asarray(comps)))
