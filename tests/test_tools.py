"""Offline tools: flow providers, fixture CLI, data generator schema."""
import numpy as np
import h5py
import pytest

from depthinspace_tpu.tools import presave_flow, make_fixture
from depthinspace_tpu.data import load_settings, generate_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools_ds")
    generate_dataset(d, n_samples=2, imsize=(64, 56), seed=3,
                     write_flow=False)
    return d


def test_rigid_flow_provider(data_dir):
    settings = load_settings(data_dir / "settings.pkl")
    for s in sorted(data_dir.glob("0*")):
        presave_flow.process_sample(s, "rigid", settings.K,
                                    settings.baseline, settings.focal_length)
        with h5py.File(s / "flow.hdf5") as f:
            keys = sorted(f.keys())
            assert len(keys) == 12            # 4*3 ordered pairs
            fl = np.asarray(f["flow_01"])
            assert fl.shape == (1, 2, 64, 56)
            assert np.isfinite(fl).all()


def test_farneback_flow_provider(data_dir):
    settings = load_settings(data_dir / "settings.pkl")
    s = sorted(data_dir.glob("0*"))[0]
    presave_flow.process_sample(s, "farneback", settings.K,
                                settings.baseline, settings.focal_length)
    with h5py.File(s / "flow.hdf5") as f:
        fl = np.asarray(f["flow_01"])
        assert fl.shape == (1, 2, 64, 56)
        assert np.isfinite(fl).all()


def test_rigid_flow_roundtrip_consistency(data_dir):
    """flow_ij + flow_ji circle back to ~zero for static scenes (away from
    occlusions) — the property the losses' fb-mask tests."""
    settings = load_settings(data_dir / "settings.pkl")
    s = sorted(data_dir.glob("0*"))[0]
    presave_flow.process_sample(s, "rigid", settings.K,
                                settings.baseline, settings.focal_length)
    with h5py.File(s / "frames.hdf5") as f:
        disp = np.asarray(f["disp"][:, 0])
        R = np.asarray(f["R"])
        t = np.asarray(f["t"])
    depth = settings.baseline * settings.focal_length / np.maximum(disp, 1e-6)
    f01 = presave_flow.rigid_flow(depth[0], settings.K, R[0], t[0], R[1], t[1])
    f10 = presave_flow.rigid_flow(depth[1], settings.K, R[1], t[1], R[0], t[0])
    # sample f10 at the f01-displaced positions (nearest neighbor suffices)
    H, W = depth[0].shape
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    x = np.clip(np.round(u + f01[0]).astype(int), 0, W - 1)
    y = np.clip(np.round(v + f01[1]).astype(int), 0, H - 1)
    back = f10[:, y, x]
    resid = np.sqrt(((f01 + back) ** 2).sum(0))
    assert np.median(resid) < 0.5


def test_make_fixture_cli(tmp_path):
    out = tmp_path / "fx"
    make_fixture.main([str(out), "--n", "1", "--imsize", "32", "24"])
    assert (out / "settings.pkl").exists()
    with h5py.File(out / "00000000" / "frames.hdf5") as f:
        assert f["im"].shape == (4, 1, 32, 24)
        assert f["R"].shape == (4, 3, 3)
