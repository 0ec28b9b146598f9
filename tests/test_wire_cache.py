"""Wire-cache fast path (data/cache.py): encoded-batch equivalence.

The cached loader must produce bit-identical wire-encoded batches to the
HDF5 TrackDataset -> collate -> encode_batch path, including the per-epoch
frame permutations, so cached and uncached runs train on identical data.
"""
import numpy as np
import pytest

from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.data.dataset import collate
from depthinspace_tpu.data.wire import encode_batch
from depthinspace_tpu.data.cache import (build_wire_cache, has_wire_cache,
                                         CachedTrackDataset, BASE_FIELDS)


@pytest.fixture(scope="module")
def cached_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cache_ds")
    generate_dataset(d, n_samples=4, imsize=(64, 56), seed=5)
    build_wire_cache(d)
    return d


def _ref_batch(d, idxs, train, epoch):
    settings = load_settings(d / "settings.pkl")
    paths = sorted(str(p) for p in d.glob("0*"))
    ds = TrackDataset(settings, paths, train=train, data_aug=False)
    ds.current_epoch = epoch
    return encode_batch(collate([ds[i] for i in idxs]))


def test_has_cache(cached_dir):
    assert has_wire_cache(cached_dir)
    assert has_wire_cache(cached_dir, BASE_FIELDS)
    assert not has_wire_cache(cached_dir, ["primary_disp"])


@pytest.mark.parametrize("train,epoch", [(False, 0), (True, 0), (True, 3)])
def test_cached_batch_matches_hdf5_path(cached_dir, train, epoch):
    names = sorted(p.name for p in cached_dir.glob("0*") if p.is_dir())
    cds = CachedTrackDataset(cached_dir, names, train=train)
    cds.current_epoch = epoch
    ref = _ref_batch(cached_dir, [0, 1, 2, 3], train, epoch)
    got = cds.get_batch([0, 1, 2, 3])
    for k in ("im", "ambient", "disp_gt", "R", "t"):
        r, g = getattr(ref, k), getattr(got, k)
        assert g.dtype == r.dtype, k
        np.testing.assert_array_equal(g, r, err_msg=k)


def test_cached_getitem_matches_get_batch(cached_dir):
    names = sorted(p.name for p in cached_dir.glob("0*") if p.is_dir())
    cds = CachedTrackDataset(cached_dir, names, train=True)
    cds.current_epoch = 1
    b1 = cds.get_batch([1, 3])
    b2 = collate([cds[1], cds[3]])
    np.testing.assert_array_equal(b1.im, b2.im)
    np.testing.assert_array_equal(b1.disp_gt, b2.disp_gt)


def test_cached_subset_split_alignment(cached_dir):
    """A split (subset of names) must index the same samples as the full
    sorted list — the worker's sorted-glob split convention."""
    names = sorted(p.name for p in cached_dir.glob("0*") if p.is_dir())
    sub = CachedTrackDataset(cached_dir, names[2:], train=False)
    full = CachedTrackDataset(cached_dir, names, train=False)
    np.testing.assert_array_equal(sub.get_batch([0]).im,
                                  full.get_batch([2]).im)


def test_dataloader_uses_get_batch(cached_dir):
    names = sorted(p.name for p in cached_dir.glob("0*") if p.is_dir())
    cds = CachedTrackDataset(cached_dir, names, train=False)
    loader = DataLoader(cds, batch_size=2, shuffle=False, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].im.dtype == np.uint16
    ref = _ref_batch(cached_dir, [0, 1], False, 0)
    np.testing.assert_array_equal(batches[0].im, ref.im)


def test_cache_extend_with_presaved_field(cached_dir):
    """primary_disp can be added after a presave stage; force re-encodes."""
    import h5py
    names = sorted(p.name for p in cached_dir.glob("0*") if p.is_dir())
    rng = np.random.RandomState(0)
    for n in names:
        with h5py.File(cached_dir / n / "single_frame_disp.hdf5", "w") as f:
            f["disp"] = rng.uniform(0, 32, (4, 1, 64, 56)).astype(np.float32)
    build_wire_cache(cached_dir, fields=["primary_disp"])
    assert has_wire_cache(cached_dir, ["primary_disp"])
    cds = CachedTrackDataset(cached_dir, names, train=False,
                             load_primary=True)
    b = cds.get_batch([0, 1])
    assert b.primary_disp is not None and b.primary_disp.dtype == np.uint16
    with h5py.File(cached_dir / names[0] / "single_frame_disp.hdf5") as f:
        ref = np.asarray(f["disp"])[:, 0]
    enc = np.clip(ref * 256.0 + 0.5, 0, 65535).astype(np.uint16)
    np.testing.assert_array_equal(b.primary_disp[:, 0], enc)
