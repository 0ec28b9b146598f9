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
from depthinspace_tpu.train.objective import make_loss_context
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
    """Provider consistency through the REAL step path: the MF eval step
    with flow_source='pred' and primary_disp == disp_gt must produce the
    same loss components as flow_source='rigid' (whose _prepare derives
    flow from disp_gt) — the pred provider's flow really is the rigid flow
    of the disparity it is handed."""
    settings, batch = fixture_batch
    H, W = settings.imsize
    K = tuple(map(tuple, settings.K.tolist()))
    model = FuseNet(imsize=(H, W), K=K, track_length=4, block_num=1,
                    channels=8, max_disp=128.0, use_remat=False)
    opt = optax.adam(1e-4)
    tl = 4
    zeros = jnp.zeros
    params = model.init(
        jax.random.key(0), zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
        zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), zeros((tl, 1, 3)),
        zeros((tl, tl, 1, H, W, 2)))
    epoch = jnp.asarray(5.0, jnp.float32)  # past the warmup gate

    comps = {}
    for source in ("rigid", "pred"):
        b = batch._replace(primary_disp=batch.disp_gt)
        dev = put_batch(encode_batch(b), None)
        ctx = make_loss_context(settings, track_length=4, flow_source=source)
        _, eval_step = build_steps(model, ctx, opt, "multi_frame")
        _, c = eval_step(params, dev, epoch)
        comps[source] = np.asarray(c)
    np.testing.assert_allclose(comps["pred"], comps["rigid"],
                               rtol=1e-5, atol=1e-6)
    # and a perturbed primary moves the pred-provider's geometric term
    # (the flow really derives from the disparity argument)
    b_off = batch._replace(
        primary_disp=np.maximum(batch.disp_gt + 2.0, 0.1))
    dev_off = put_batch(encode_batch(b_off), None)
    ctx = make_loss_context(settings, track_length=4, flow_source="pred")
    _, eval_step = build_steps(model, ctx, opt, "multi_frame")
    _, c_off = eval_step(params, dev_off, epoch)
    assert abs(float(np.asarray(c_off)[2]) - float(comps["pred"][2])) > 1e-5


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
