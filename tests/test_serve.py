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
