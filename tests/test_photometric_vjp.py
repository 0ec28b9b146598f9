"""Custom-VJP pattern warp: forward + gradient parity vs the generic
gather-based bilinear sampler (which itself is validated against torch)."""
import numpy as np

import jax
import jax.numpy as jnp

from depthinspace_tpu.ops import bilinear_sample
from depthinspace_tpu.losses.photometric import warp_pattern_by_disparity


def _reference_warp(pattern, disp):
    N, H, W = disp.shape
    pat = jnp.broadcast_to(pattern[None], (N, H, W))
    u = jnp.arange(W, dtype=disp.dtype)[None, None, :]
    v = jnp.broadcast_to(jnp.arange(H, dtype=disp.dtype)[None, :, None],
                         (N, H, W))
    return bilinear_sample(pat[..., None], u - disp, v, "border")[..., 0]


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    pattern = jnp.asarray(rng.rand(20, 24).astype(np.float32))
    disp = jnp.asarray(rng.uniform(-5, 30, (3, 20, 24)).astype(np.float32))
    a = warp_pattern_by_disparity(pattern, disp)
    b = _reference_warp(pattern, disp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_disp_gradient_matches_reference():
    rng = np.random.RandomState(1)
    pattern = jnp.asarray(rng.rand(16, 20).astype(np.float32))
    # keep coordinates away from exact integers (subgradient choice differs)
    disp = jnp.asarray(rng.uniform(0.1, 10, (2, 16, 20)).astype(np.float32)
                       + 0.3)
    g = jnp.asarray(rng.randn(2, 16, 20).astype(np.float32))

    ga = jax.grad(lambda d: jnp.sum(warp_pattern_by_disparity(pattern, d) * g))(disp)
    gb = jax.grad(lambda d: jnp.sum(_reference_warp(pattern, d) * g))(disp)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4,
                               atol=1e-5)


def test_finite_difference_check():
    rng = np.random.RandomState(2)
    pattern = jnp.asarray(rng.rand(12, 14).astype(np.float32))
    disp = jnp.asarray(rng.uniform(1, 5, (1, 12, 14)).astype(np.float32) + 0.37)

    def f(d):
        return jnp.sum(jnp.sin(warp_pattern_by_disparity(pattern, d)))

    g = jax.grad(f)(disp)
    eps = 1e-3
    # probe a few positions
    for (i, j) in [(3, 4), (7, 9), (0, 0)]:
        d2 = disp.at[0, i, j].add(eps)
        d1 = disp.at[0, i, j].add(-eps)
        fd = (f(d2) - f(d1)) / (2 * eps)
        assert abs(float(fd) - float(g[0, i, j])) < 5e-3, (i, j)
