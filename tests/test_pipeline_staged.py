"""Staged pipeline integration: DIS-SF -> presave -> DIS-MF -> DIS-FTSF.

Exercises the hand-off file contract end-to-end on fixture data:
  1. a (random-weight) SF net's disparities are presaved via the tool ->
     single_frame_disp.hdf5;
  2. the MF dataset loads them as primary_disp and an MF train step runs;
  3. multi_frame_disp.hdf5 feeds the SF dataset as pseudo_gt (DIS-FTSF)
     and an SF train step with the pseudo-GT loss term runs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import h5py

from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.models import DispNet, FuseNet
from depthinspace_tpu.train import (TrainState, make_loss_context,
                                    build_steps)
from depthinspace_tpu.tools import presave_disp as presave_tool
from flax import serialization


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("staged")
    generate_dataset(d, n_samples=2, imsize=(64, 56), seed=5)
    return d


def test_stage1_sf_presave(pipeline_dir):
    settings = load_settings(pipeline_dir / "settings.pkl")
    # random-weight SF net, exported in the net_%04d.params contract
    out_dir = pipeline_dir / "out" / "single_frame"
    out_dir.mkdir(parents=True, exist_ok=True)
    template, infer = presave_tool.build_sf_infer(settings)
    with open(out_dir / "net_0000.params", "wb") as f:
        f.write(serialization.to_bytes(template))

    presave_tool.main(["single_frame", "--epoch", "0",
                       "--data_dir", str(pipeline_dir),
                       "--output_dir", str(pipeline_dir / "out")])

    for sample in sorted(pipeline_dir.glob("0*")):
        with h5py.File(sample / "single_frame_disp.hdf5") as f:
            disp = np.asarray(f["disp"])
            assert disp.shape[0] == 4 and disp.shape[1] == 1
            assert np.all(np.isfinite(disp))
            assert disp.min() >= 0 and disp.max() <= 128


def test_stage2_mf_train_step(pipeline_dir):
    settings = load_settings(pipeline_dir / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in pipeline_dir.glob("0*")),
                      train=False, load_flow=True, load_primary=True)
    batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
    assert batch.primary_disp is not None

    H, W = settings.imsize
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, settings.K.tolist())),
                    track_length=4, block_num=1, channels=8)
    ctx = make_loss_context(settings, track_length=4)
    opt = optax.adam(1e-4)
    tl = 4
    z = jnp.zeros
    params = model.init(
        jax.random.key(0), z((tl, 1, H, W, 2)), z((tl, 1, H, W, 1)),
        z((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), z((tl, 1, 3)),
        z((tl, tl, 1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, eval_step = build_steps(model, ctx, opt, "multi_frame", None)

    state, comps = train_step(state, batch, jnp.asarray(0.0))
    comps = np.asarray(comps)
    assert np.all(np.isfinite(comps))
    assert comps.shape[0] == 4  # photometric, smooth, geometric, warmup

    disp0, _ = eval_step(state.params, batch, jnp.asarray(0.0))
    # write the multi_frame_disp.hdf5 hand-off for stage 3 (eval_step
    # returns the u16 wire encoding)
    from depthinspace_tpu.data.wire import decode_disp_np
    disp0 = decode_disp_np(disp0)
    for i, sample in enumerate(sorted(pipeline_dir.glob("0*"))):
        with h5py.File(sample / "multi_frame_disp.hdf5", "w") as f:
            f.create_dataset("disp", data=disp0[:, i][:, None])


def test_stage3_ftsf_pseudo_gt(pipeline_dir):
    settings = load_settings(pipeline_dir / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in pipeline_dir.glob("0*")),
                      train=False, load_flow=True, load_pseudo_gt=True)
    batch = next(iter(DataLoader(ds, batch_size=2, num_workers=1)))
    assert batch.pseudo_gt is not None

    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, use_pseudo_gt=True)
    opt = optax.adam(1e-4)
    H, W = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, "single_frame", None)

    state, comps = train_step(state, batch, jnp.asarray(0.0))
    comps = np.asarray(comps)
    assert np.all(np.isfinite(comps))
    # 4 photometric + smooth + geometric + 4 pseudo-gt terms
    assert comps.shape[0] == 10


def test_presave_mf_rigid_flow(pipeline_dir):
    """Stage-4 path for --flow_source rigid pipelines: MF presave computes
    flow in-graph from GT disparity + poses (no flow.hdf5 on disk)."""
    settings = load_settings(pipeline_dir / "settings.pkl")
    out_dir = pipeline_dir / "out" / "multi_frame"
    out_dir.mkdir(parents=True, exist_ok=True)
    template, _, _ = presave_tool.build_mf_infer(settings,
                                                 flow_source="rigid")
    with open(out_dir / "net_0000.params", "wb") as f:
        f.write(serialization.to_bytes(template))

    presave_tool.main(["multi_frame", "--epoch", "0",
                       "--flow_source", "rigid", "--batch", "2",
                       "--data_dir", str(pipeline_dir),
                       "--output_dir", str(pipeline_dir / "out")])
    H, W = settings.imsize
    for sample in sorted(pipeline_dir.glob("0*")):
        with h5py.File(sample / "multi_frame_disp.hdf5", "r") as f:
            d = np.asarray(f["disp"])
        assert d.shape == (4, 1, H, W)
        assert np.all(np.isfinite(d)) and d.min() >= 0
