"""Extra parity components: SSIM, projection-depth loss, output heads,
matching ops."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthinspace_tpu.losses.extra import (ssim, occlusion_mask,
                                           projection_depth_similarity_loss)
from depthinspace_tpu.losses import CameraGeometry
from depthinspace_tpu.models.heads import (MultiLinear, make_output_head,
                                           pos_to_depth)
from depthinspace_tpu.ops.matching import (nn_search, crosscheck, proj_nn,
                                           xcorrvol)


def test_ssim_identical_images_zero():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 18, 1), jnp.float32)
    out = ssim(x, x)
    assert float(jnp.abs(out).max()) < 1e-5
    y = jnp.asarray(np.random.RandomState(1).rand(2, 16, 18, 1), jnp.float32)
    assert float(ssim(x, y).mean()) > 0.01


def test_ssim_matches_torch():
    import torch
    x = np.random.RandomState(0).rand(2, 12, 14, 1).astype(np.float32)
    y = np.random.RandomState(1).rand(2, 12, 14, 1).astype(np.float32)

    def torch_ssim(a, b):
        a = torch.from_numpy(np.moveaxis(a, -1, 1))
        b = torch.from_numpy(np.moveaxis(b, -1, 1))
        refl = torch.nn.ReflectionPad2d(1)
        pool = torch.nn.AvgPool2d(3, 1)
        a, b = refl(a), refl(b)
        mu_x, mu_y = pool(a), pool(b)
        sx = pool(a ** 2) - mu_x ** 2
        sy = pool(b ** 2) - mu_y ** 2
        sxy = pool(a * b) - mu_x * mu_y
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        n = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
        d = (mu_x ** 2 + mu_y ** 2 + C1) * (sx + sy + C2)
        return np.moveaxis(torch.clamp((1 - n / d) / 2, 0, 1).numpy(), 1, -1)

    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = torch_ssim(x, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_projection_depth_similarity_consistent_depths():
    H, W = 24, 20
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    cam = CameraGeometry.create(K, H, W)
    depth = jnp.full((2, H, W), 3.0)
    R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3)).astype(jnp.float32)
    t = jnp.zeros((2, 3))
    loss, rf0, rf1, m0, m1 = projection_depth_similarity_loss(
        cam, depth, depth, R, t, R, t)
    assert float(loss) < 1e-5
    assert float(jnp.abs(rf0).max()) < 1e-4     # identity pose -> zero flow
    assert float(m0.mean()) > 0.99


def test_multilinear_per_row_independence():
    ml = MultiLinear(height=6, features=2)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 8, 3), jnp.float32)
    params = ml.init(jax.random.key(0), x)
    out = ml.apply(params, x)
    assert out.shape == (1, 6, 8, 2)
    # changing one row's input changes only that row's output
    x2 = x.at[0, 2].add(1.0)
    out2 = ml.apply(params, x2)
    changed = np.abs(np.asarray(out2 - out)).sum(axis=(0, 2, 3))
    assert changed[2] > 0
    assert np.all(changed[[0, 1, 3, 4, 5]] < 1e-6)


def test_output_head_factory_variants():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 4), jnp.float32)
    for kind in ("linear", "disp", "disp_row", "pos", "pos_row"):
        head = make_output_head(kind, height=8, alpha=64.0) \
            if kind != "linear" else make_output_head(kind)
        params = head.init(jax.random.key(0), x)
        out = head.apply(params, x)
        assert out.shape == (2, 8, 10, 1), kind
        if kind == "disp":
            assert float(out.min()) >= 0 and float(out.max()) <= 64


def test_pos_to_depth():
    pos = jnp.broadcast_to(
        jnp.arange(10, dtype=jnp.float32)[None, None, :, None] - 2.0,
        (1, 4, 10, 1))
    depth = pos_to_depth(pos, focal_length=100.0, baseline=0.05)
    # disp = u - pos = 2 everywhere -> depth = 100*0.05/2 = 2.5
    np.testing.assert_allclose(np.asarray(depth), 2.5, rtol=1e-5)


def test_nn_search():
    a = jnp.asarray([[[0, 0, 0], [5, 5, 5]]], jnp.float32)
    b = jnp.asarray([[[4.9, 5, 5], [0.1, 0, 0], [9, 9, 9]]], jnp.float32)
    idx = nn_search(a, b)
    assert idx.tolist() == [[1, 0]]


def test_crosscheck_consistent():
    disp = jnp.full((1, 6, 32), 4.0)
    mask = crosscheck(disp, disp, threshold=1.0)
    assert float(mask.mean()) == 1.0
    mask2 = crosscheck(disp, disp * 3, threshold=1.0)
    assert float(mask2.mean()) < 0.5


def test_proj_nn_identity():
    xyz = jnp.asarray(np.random.RandomState(0).rand(1, 8, 10, 3), jnp.float32)
    out = proj_nn(xyz, xyz, jnp.eye(3), patch_size=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xyz), atol=1e-6)


def test_xcorrvol_peak_at_true_disparity():
    rng = np.random.RandomState(0)
    W = 64
    right = rng.rand(1, 16, W).astype(np.float32)
    d_true = 5
    left = np.roll(right, d_true, axis=2)     # left(u) = right(u - d)
    vol = np.asarray(xcorrvol(jnp.asarray(left), jnp.asarray(right),
                              n_disps=16, block_size=5))
    best = vol[0, :, 16:W - 16, :].mean(axis=(0, 1)).argmax()
    assert best == d_true
