"""Data-order reproducibility under the threaded loader.

The per-sample frame permutation and augmentation draws must come from the
per-index RNG (seeded by epoch*len+idx), never the global np.random — the
loader maps __getitem__ across a thread pool, so global-RNG draws would be
thread-timing-dependent (VERDICT r1 weak #6).  Two loaders over the same
dataset/epoch must produce identical batches regardless of worker count.
"""
import numpy as np
import pytest

from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.data.dataset import Batch


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("det")
    generate_dataset(d, n_samples=4, imsize=(32, 24), seed=7)
    return d


def _collect(ds, num_workers):
    loader = DataLoader(ds, batch_size=2, shuffle=False,
                        num_workers=num_workers)
    return list(loader)


def _assert_batches_equal(a: Batch, b: Batch):
    for k in Batch._fields:
        va, vb = getattr(a, k), getattr(b, k)
        assert (va is None) == (vb is None), k
        if va is not None:
            np.testing.assert_array_equal(va, vb, err_msg=k)


def test_train_batches_reproducible_across_worker_counts(data_dir):
    paths = sorted(str(p) for p in data_dir.glob("0*"))
    settings = load_settings(data_dir / "settings.pkl")

    def make_ds():
        ds = TrackDataset(settings, paths, train=True, data_aug=True,
                          track_length=4, load_flow=True)
        ds.current_epoch = 3
        return ds

    run1 = _collect(make_ds(), num_workers=1)
    run4 = _collect(make_ds(), num_workers=4)
    assert len(run1) == len(run4) == 2
    for a, b in zip(run1, run4):
        _assert_batches_equal(a, b)


def test_epoch_changes_the_permutation(data_dir):
    paths = sorted(str(p) for p in data_dir.glob("0*"))
    settings = load_settings(data_dir / "settings.pkl")
    ds = TrackDataset(settings, paths, train=True, data_aug=False,
                      track_length=4)
    ds.current_epoch = 0
    s0 = ds[0]["im"]
    ds.current_epoch = 1
    s1 = ds[0]["im"]
    # different epoch -> different frame permutation (w.h.p. on 4! orders)
    assert not np.array_equal(s0, s1)
