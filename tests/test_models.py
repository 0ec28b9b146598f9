"""Model smoke tests: shapes, output ranges, jit/grad compatibility."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthinspace_tpu.models import DispNet, FuseNet


H, W = 64, 56  # divisible by 8; small for CPU tests


def test_dispnet_shapes_and_range():
    model = DispNet(max_disp=128.0)
    x = jnp.zeros((2, H, W, 2))
    params = model.init(jax.random.key(0), x)
    outs = jax.jit(model.apply)(params, x)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (2, H, W, 1)
        assert np.all(np.asarray(o) >= 0)
        assert np.all(np.asarray(o) <= 128.0)
    # at zero input the sigmoid(x-3) head sits near 0.045*max_disp
    assert float(outs[0].mean()) < 30.0


def test_dispnet_grad_flows():
    model = DispNet(max_disp=128.0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 2), jnp.float32)
    params = model.init(jax.random.key(0), x)

    def loss(p):
        outs = model.apply(p, x)
        return sum(jnp.mean(o) for o in outs)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.fixture(scope="module")
def fusenet_setup():
    tl, N = 4, 1
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, block_num=2, channels=16, max_disp=128.0)
    rng = np.random.RandomState(0)
    ir = jnp.asarray(rng.rand(tl, N, H, W, 2), jnp.float32)
    amb = jnp.asarray(rng.rand(tl, N, H, W, 1), jnp.float32)
    pdisp = jnp.asarray(rng.uniform(10, 50, (tl, N, H, W, 1)), jnp.float32)
    pdepth = 40.0 * 0.025 / pdisp
    R = jnp.broadcast_to(jnp.eye(3), (tl, N, 3, 3)).astype(jnp.float32)
    t = jnp.asarray(rng.uniform(-0.05, 0.05, (tl, N, 3)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1, 1, (tl, tl, N, H, W, 2)), jnp.float32)
    args = (ir, amb, pdisp, pdepth, R, t, flow)
    params = model.init(jax.random.key(0), *args)
    return model, params, args


def test_fusenet_shapes_and_range(fusenet_setup):
    model, params, args = fusenet_setup
    out = jax.jit(model.apply)(params, *args)
    assert out.shape == (4, 1, H, W, 1)
    assert np.all(np.asarray(out) >= 0)
    assert np.all(np.asarray(out) <= 128.0)


def test_fusenet_grad_flows(fusenet_setup):
    model, params, args = fusenet_setup

    def loss(p):
        return jnp.mean(model.apply(p, *args))

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    nonzero = sum(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert nonzero > len(leaves) // 2
