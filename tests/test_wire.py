"""16-bit wire encoding for host->device batches (data/wire.py): roundtrip
error bounds, f32 passthrough, and train-step equivalence raw vs encoded."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.data.dataset import Batch
from depthinspace_tpu.data.settings import Settings
from depthinspace_tpu.data.fixture import make_dot_pattern
from depthinspace_tpu.data.wire import encode_batch, decode_batch, decode_batch_np
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train import TrainState, make_loss_context, build_steps

H, W = 32, 24
TL, BS = 4, 2


def _batch():
    rng = np.random.RandomState(0)
    return Batch(
        im=rng.rand(TL, BS, H, W).astype(np.float32),
        ambient=rng.rand(TL, BS, H, W).astype(np.float32),
        disp_gt=rng.uniform(0, 200, (TL, BS, H, W)).astype(np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (TL, BS, 3, 3)).copy(),
        t=rng.uniform(-0.05, 0.05, (TL, BS, 3)).astype(np.float32),
        flow=rng.uniform(-30, 30, (TL, TL, BS, H, W, 2)).astype(np.float32),
        primary_disp=rng.uniform(0, 100, (TL, BS, H, W)).astype(np.float32),
    )


def test_roundtrip_error_bounds():
    b = _batch()
    enc = encode_batch(b)
    assert enc.im.dtype == np.uint16
    assert enc.disp_gt.dtype == np.uint16
    assert enc.flow.dtype == np.int16
    assert enc.R.dtype == np.float32          # passthrough
    dec = decode_batch_np(enc)
    assert np.max(np.abs(dec.im - b.im)) <= 1.0 / 65535.0
    assert np.max(np.abs(dec.ambient - b.ambient)) <= 1.0 / 65535.0
    assert np.max(np.abs(dec.disp_gt - b.disp_gt)) <= 1.0 / 256.0
    assert np.max(np.abs(dec.primary_disp - b.primary_disp)) <= 1.0 / 256.0
    assert np.max(np.abs(dec.flow - b.flow)) <= 0.5 / 256.0
    np.testing.assert_array_equal(dec.R, b.R)


def test_f32_passthrough_identity():
    b = _batch()
    dec = decode_batch(jax.device_put(b))
    for k in Batch._fields:
        v, d = getattr(b, k), getattr(dec, k)
        if v is None:
            assert d is None
        else:
            np.testing.assert_array_equal(np.asarray(d), v)


def test_train_step_raw_vs_encoded_close():
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                       baseline=0.025, K=K)
    ctx = make_loss_context(settings, track_length=TL, augment=False)
    model = DispNet(max_disp=128.0)
    opt = optax.adam(1e-4)
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    train_step, _ = build_steps(model, ctx, opt, "single_frame", None)

    b = _batch()
    b = b._replace(disp_gt=np.clip(b.disp_gt, 0, 20),
                   flow=(b.flow * 0.05).astype(np.float32))
    # train_step donates the state — give each call its own copy
    fresh = lambda: TrainState.create(jax.tree.map(jnp.array, params), opt,
                                      jax.random.key(1))
    _, comps_raw = train_step(fresh(), jax.device_put(b), jnp.asarray(0.0))
    _, comps_enc = train_step(fresh(), jax.device_put(encode_batch(b)),
                              jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(comps_enc), np.asarray(comps_raw),
                               rtol=2e-3, atol=2e-4)
