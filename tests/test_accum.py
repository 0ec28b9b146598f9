"""Gradient accumulation (train/steps.py accum_steps).

No batch statistics in these models, so the averaged microbatch gradient
equals the full-batch gradient for plain-mean loss terms; the masked-mean
terms (photometric/geometric) normalize per microbatch, so the accum=2
step direction must agree with accum=1 to high precision without being
bit-identical (cosine + norm-ratio assertions below catch real chunking/
averaging bugs like a missing 1/k or device-misaligned chunks).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.data import TrackDataset, load_settings, generate_dataset
from depthinspace_tpu.data.dataset import Batch, collate
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train.objective import make_loss_context
from depthinspace_tpu.train.steps import _chunk_batch, build_steps
from depthinspace_tpu.train.state import TrainState


@pytest.fixture(scope="module")
def fixture_batch(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds") / "ds"
    generate_dataset(d, n_samples=4, imsize=(64, 56), seed=11)
    settings = load_settings(d / "settings.pkl")
    paths = sorted(str(p) for p in d.glob("0*"))
    dset = TrackDataset(settings, paths, train=False, data_aug=False,
                        load_flow=False)
    return settings, collate([dset[i] for i in range(4)])


def test_chunk_batch_dp_layout():
    """dp-aware chunking takes consecutive samples from every device block."""
    tl, bs = 2, 8
    im = np.arange(tl * bs).reshape(tl, bs).astype(np.float32)
    im = np.broadcast_to(im[..., None, None], (tl, bs, 4, 4)).copy()
    b = Batch(im=im, ambient=im, disp_gt=im,
              R=np.zeros((tl, bs, 3, 3), np.float32),
              t=np.zeros((tl, bs, 3), np.float32))
    # dp=2 blocks: dev0 owns samples 0..3, dev1 owns 4..7; chunk 0 must be
    # [0, 1, 4, 5] (2 from each block), chunk 1 = [2, 3, 6, 7]
    c = _chunk_batch(b, 2, dp=2)
    got = np.asarray(c.im)[:, 0, :, 0, 0]
    np.testing.assert_array_equal(got, [[0, 1, 4, 5], [2, 3, 6, 7]])
    # dp=1: plain contiguous halves
    c1 = _chunk_batch(b, 2, dp=1)
    got1 = np.asarray(c1.im)[:, 0, :, 0, 0]
    np.testing.assert_array_equal(got1, [[0, 1, 2, 3], [4, 5, 6, 7]])


def _half_batch(batch, lo, hi):
    def cut(name, x):
        if x is None:
            return None
        a = 2 if name == "flow" else 1
        sl = [slice(None)] * x.ndim
        sl[a] = slice(lo, hi)
        return x[tuple(sl)]
    return Batch(**{f: cut(f, getattr(batch, f)) for f in Batch._fields})


def test_accum_matches_manual_microbatch_average(fixture_batch):
    """Mechanism exactness: one accum=2 SGD step must equal the average of
    the two half-batch gradients computed independently through the same
    step (identical math — catches wrong 1/k, chunk layout, or scan
    carries).  Full-batch accum=1 only agrees statistically (masked-mean
    terms renormalize per microbatch), checked loosely at the end."""
    settings, batch = fixture_batch
    H, W = settings.imsize
    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, flow_source="pred",
                            augment=False)
    lr = 1e-3
    opt = optax.sgd(lr)   # update IS -lr * grad
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))

    def step_update(accum, b):
        train_step, _ = build_steps(model, ctx, opt, "single_frame",
                                    accum_steps=accum)
        state = TrainState.create(jax.tree.map(jnp.array, params), opt,
                                  jax.random.key(7))
        state, comps = train_step(state, jax.device_put(b), jnp.asarray(0.0))
        upd = [np.asarray(p1) - np.asarray(p0) for p0, p1 in
               zip(jax.tree.leaves(params), jax.tree.leaves(state.params))]
        return upd, np.asarray(comps)

    upd_acc, comps_acc = step_update(2, batch)
    upd_a, comps_a = step_update(1, _half_batch(batch, 0, 2))
    upd_b, comps_b = step_update(1, _half_batch(batch, 2, 4))

    for ua, ub, uacc in zip(upd_a, upd_b, upd_acc):
        manual = 0.5 * (ua + ub)
        scale = np.abs(manual).max()
        np.testing.assert_allclose(uacc, manual, rtol=1e-4,
                                   atol=max(1e-5 * scale, 1e-8))
    np.testing.assert_allclose(comps_acc, 0.5 * (comps_a + comps_b),
                               rtol=1e-5, atol=1e-7)

    # statistical agreement with the full-batch gradient (loose)
    upd_full, _ = step_update(1, batch)
    for uf, uacc in zip(upd_full, upd_acc):
        na, nb = np.linalg.norm(uf), np.linalg.norm(uacc)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(uf.ravel() @ uacc.ravel() / (na * nb + 1e-30))
        assert cos > 0.98, cos
        assert 0.8 < na / nb < 1.25, (na, nb)
