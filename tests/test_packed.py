"""Frame-packed FuseNet path (models/packed.py): parameter-tree and value
equivalence with the frame-major path.

The packed path folds the tl frames into channel groups and runs every 2D
conv as a feature_group_count=tl grouped conv with frame-shared weights —
the math is identical, so with the same parameters the two paths must
agree to float tolerance, and their parameter trees must be identical so
checkpoints interchange."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


TL, N, H, W = 4, 2, 64, 56


def _make(packed, channels=16, dtype=jnp.float32):
    from depthinspace_tpu.models import FuseNet
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    return FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                   track_length=TL, block_num=2, channels=channels,
                   max_disp=32.0, use_remat=False, compute_dtype=dtype,
                   packed=packed)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    ir = rng.rand(TL, N, H, W, 2).astype(np.float32)
    amb = rng.rand(TL, N, H, W, 1).astype(np.float32)
    disp = rng.uniform(1, 30, (TL, N, H, W, 1)).astype(np.float32)
    depth = 50.0 * 0.025 / disp
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (TL, N, 3, 3)).copy()
    t = rng.uniform(-0.01, 0.01, (TL, N, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (TL, TL, N, H, W, 2)).astype(np.float32)
    return tuple(map(jnp.asarray, (ir, amb, disp, depth, R, t, flow)))


def test_param_trees_identical():
    args = _inputs()
    pu = _make(False).init(jax.random.key(0), *args)
    pp = _make(True).init(jax.random.key(0), *args)
    flat_u = jax.tree_util.tree_flatten_with_path(pu)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(pp)[0]
    paths_u = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_u]
    paths_p = [(jax.tree_util.keystr(k), v.shape) for k, v in flat_p]
    assert paths_u == paths_p
    # same name path + same shape => flax init draws identical values
    for (ku, vu), (kp, vp) in zip(flat_u, flat_p):
        np.testing.assert_array_equal(np.asarray(vu), np.asarray(vp),
                                      err_msg=jax.tree_util.keystr(ku))


def test_forward_equivalence_f32():
    args = _inputs()
    mu, mp = _make(False), _make(True)
    params = mu.init(jax.random.key(1), *args)
    out_u = np.asarray(jax.jit(mu.apply)(params, *args))
    out_p = np.asarray(jax.jit(mp.apply)(params, *args))
    # identical math modulo f32 reduction order (GroupNorm statistics)
    np.testing.assert_allclose(out_u, out_p, rtol=2e-4, atol=2e-4)


def test_grad_equivalence_f32():
    args = _inputs(3)
    mu, mp = _make(False), _make(True)
    params = mu.init(jax.random.key(2), *args)

    def loss(model):
        return lambda p: jnp.mean(jnp.abs(model.apply(p, *args)))

    gu = jax.jit(jax.grad(loss(mu)))(params)
    gp = jax.jit(jax.grad(loss(mp)))(params)
    flat_u = jax.tree_util.tree_flatten_with_path(gu)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (ku, vu), (_, vp) in zip(flat_u, flat_p):
        np.testing.assert_allclose(
            np.asarray(vu), np.asarray(vp), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(ku))
