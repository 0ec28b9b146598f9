"""LCN and Sobel vs direct torch module oracles re-implemented here."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from depthinspace_tpu.ops import lcn, sobel


def torch_lcn(x, radius, epsilon):
    """Oracle for reference LCN (model/networks.py:663-689)."""
    xt = torch.from_numpy(x[:, None])  # NCHW
    k = 2 * radius + 1
    w = torch.ones(1, 1, k, k)
    xp = F.pad(xt, (radius,) * 4, mode="reflect")
    boxs = F.conv2d(xp, w)
    avgs = boxs / k ** 2
    boxs_2n = F.conv2d(F.pad(xt * xt, (radius,) * 4, mode="reflect"), w)
    stds = torch.sqrt(torch.clamp(boxs_2n / k ** 2 - avgs ** 2 + 1e-6, min=0))
    stds = stds + epsilon
    out = (xt - avgs) / stds
    return out[:, 0].numpy(), stds[:, 0].numpy()


def test_lcn_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 24, 20).astype(np.float32)
    ours, ours_std = lcn(jnp.asarray(x), radius=5, epsilon=0.05)
    ref, ref_std = torch_lcn(x, 5, 0.05)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_std), ref_std, rtol=1e-4, atol=1e-5)


def torch_sobel(x, ksize):
    """Oracle for reference SobelFilter (model/networks.py:693-731)."""
    if ksize == 5:
        kx = np.array([[-5, -4, 0, 4, 5],
                       [-8, -10, 0, 10, 8],
                       [-10, -20, 0, 20, 10],
                       [-8, -10, 0, 10, 8],
                       [-5, -4, 0, 4, 5]]) / 240.0
        p = 2
    else:
        kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]) / 8.0
        p = 1
    ky = kx.T
    xt = torch.from_numpy(x[:, None])
    xt = F.pad(xt, (p,) * 4, mode="replicate")
    gx = F.conv2d(xt, torch.from_numpy(kx[None, None]).float())
    gy = F.conv2d(xt, torch.from_numpy(ky[None, None]).float())
    return torch.cat([gx, gy], dim=1).numpy()


def test_sobel_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 18, 22).astype(np.float32)
    for ksize in (3, 5):
        ours = sobel(jnp.asarray(x)[..., None], ksize=ksize)
        ref = np.moveaxis(torch_sobel(x, ksize), 1, -1)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
