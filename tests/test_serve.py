"""DisparityServer: bucketing, padding, checkpoint loading, mesh sharding."""
import numpy as np

import jax
import jax.numpy as jnp

from depthinspace_tpu.serve import DisparityServer, _bucket
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train.checkpoint import save_net_params

H, W = 32, 24


def test_bucket():
    assert _bucket(1, 32) == 1
    assert _bucket(3, 32) == 4
    assert _bucket(33, 32) == 32


def _params():
    model = DispNet(max_disp=128.0)
    return model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))


def test_infer_matches_direct_and_handles_ragged():
    params = _params()
    srv = DisparityServer(params, imsize=(H, W), max_batch=4)
    rng = np.random.RandomState(0)
    ims = rng.rand(6, H, W).astype(np.float32)   # ragged: 2 chunks (4 + 2)
    out = srv.infer(ims)
    assert out.shape == (6, H, W)
    # each input row's result is independent of its batch-mates (convnet) —
    # compare against a 1-at-a-time run through the same server
    one = np.concatenate([srv.infer(ims[i:i + 1]) for i in range(6)])
    np.testing.assert_allclose(out, one, rtol=1e-5, atol=1e-5)


def test_from_checkpoint(tmp_path):
    params = _params()
    save_net_params(tmp_path, 7, params)
    srv = DisparityServer.from_checkpoint(tmp_path / "net_0007.params",
                                          imsize=(H, W), max_batch=2)
    out = srv.infer(np.zeros((1, H, W), np.float32))
    assert np.all(np.isfinite(out))


def test_track_server_full_pipeline():
    """TrackDisparityServer: SF -> (learned flow | provided flow) -> MF in
    one jitted program; ragged batch padded to the bucket."""
    from depthinspace_tpu.serve import TrackDisparityServer
    from depthinspace_tpu.models import FuseNet
    from depthinspace_tpu.models.flownet import FlowNet

    Ht, Wt, tl = 32, 32, 4              # FlowNet needs /16, FuseNet /4
    K = np.array([[20.0, 0, Wt / 2], [0, 20.0, Ht / 2], [0, 0, 1]],
                 np.float32)

    sf = DispNet(max_disp=128.0)
    sf_params = sf.init(jax.random.key(0), jnp.zeros((1, Ht, Wt, 2)))
    mf = FuseNet(imsize=(Ht, Wt), K=tuple(map(tuple, K.tolist())),
                 track_length=tl, max_disp=128.0)
    z = jnp.zeros
    mf_params = mf.init(
        jax.random.key(1), z((tl, 1, Ht, Wt, 2)), z((tl, 1, Ht, Wt, 1)),
        z((tl, 1, Ht, Wt, 1)), jnp.ones((tl, 1, Ht, Wt, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)), z((tl, 1, 3)),
        z((tl, tl, 1, Ht, Wt, 2)))
    fl = FlowNet()
    # 2-channel [ambient, IR] input — the trained default (train_flow)
    fl_params = fl.init(jax.random.key(2), z((1, Ht, Wt, 2)),
                        z((1, Ht, Wt, 2)))

    srv = TrackDisparityServer(
        sf_params, mf_params, fl_params, imsize=(Ht, Wt), K=K,
        track_length=tl, max_tracks=4, compute_dtype=jnp.float32)

    rng = np.random.RandomState(3)
    n = 3                               # ragged: padded up to bucket 4
    im = rng.rand(n, tl, Ht, Wt).astype(np.float32)
    amb = rng.rand(n, tl, Ht, Wt).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n, tl, 3, 3)).copy()
    t = rng.uniform(-0.01, 0.01, (n, tl, 3)).astype(np.float32)

    out = srv.infer(im, amb, R, t)      # learned-flow path
    assert out.shape == (n, tl, Ht, Wt)
    assert np.all(np.isfinite(out)) and np.all(out >= 0)

    flow = rng.uniform(-1, 1, (n, tl, tl, Ht, Wt, 2)).astype(np.float32)
    out2 = srv.infer(im, amb, R, t, flow=flow)   # provided-flow path
    assert out2.shape == (n, tl, Ht, Wt)
    assert np.all(np.isfinite(out2))
    # the two flow sources must actually reach the network
    assert not np.allclose(out, out2)


def test_mesh_sharded_matches_single():
    from depthinspace_tpu.parallel import make_mesh
    params = _params()
    rng = np.random.RandomState(1)
    ims = rng.rand(8, H, W).astype(np.float32)
    single = DisparityServer(params, imsize=(H, W), max_batch=8).infer(ims)
    mesh = make_mesh()
    sharded = DisparityServer(params, imsize=(H, W), max_batch=8,
                              mesh=mesh).infer(ims)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)
