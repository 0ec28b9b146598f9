"""bilinear_sample / warp / resize vs torch.nn.functional oracles."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from depthinspace_tpu.ops import bilinear_sample, warp, resize_bilinear, resize_flow


def torch_grid_sample(img_nhwc, x, y, padding):
    """torch oracle: normalized grid, align_corners=True."""
    N, H, W, C = img_nhwc.shape
    img = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1).copy())
    gx = 2.0 * (x / (W - 1) - 0.5)
    gy = 2.0 * (y / (H - 1) - 0.5)
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    out = F.grid_sample(img, grid, mode="bilinear", padding_mode=padding,
                        align_corners=True)
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_bilinear_sample_matches_torch(padding):
    rng = np.random.RandomState(0)
    N, H, W, C = 2, 13, 17, 3
    img = rng.randn(N, H, W, C).astype(np.float32)
    # coordinates straddling in/out of bounds, including exact integers
    x = rng.uniform(-4, W + 3, size=(N, 9, 11)).astype(np.float32)
    y = rng.uniform(-4, H + 3, size=(N, 9, 11)).astype(np.float32)
    x[0, 0, 0] = 3.0
    y[0, 0, 0] = 2.0

    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(x),
                                      jnp.asarray(y), padding=padding))
    ref = torch_grid_sample(img, x, y, padding)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_warp_matches_reference_semantics():
    """warp(x, flow) == grid_sample at identity+flow with zeros padding
    (reference model/multi_frame_networks.py:83-99)."""
    rng = np.random.RandomState(1)
    N, H, W, C = 2, 12, 16, 4
    x = rng.randn(N, H, W, C).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(N, H, W, 2)).astype(np.float32)

    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    gx = flow[..., 0] + u
    gy = flow[..., 1] + v
    ref = torch_grid_sample(x, gx, gy, "zeros")
    ours = np.asarray(warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_resize_bilinear_matches_torch(align_corners):
    rng = np.random.RandomState(2)
    N, H, W, C = 2, 14, 10, 3
    x = rng.randn(N, H, W, C).astype(np.float32)
    for h2, w2 in [(28, 20), (7, 5), (17, 9)]:
        xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        ref = F.interpolate(xt, size=(h2, w2), mode="bilinear",
                            align_corners=align_corners)
        ref = np.moveaxis(ref.numpy(), 1, -1)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), h2, w2,
                                          align_corners=align_corners))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=2e-5)


def test_resize_flow_scales_values():
    rng = np.random.RandomState(3)
    flow = rng.randn(2, 8, 6, 2).astype(np.float32)
    out = np.asarray(resize_flow(jnp.asarray(flow), 16, 12))
    assert out.shape == (2, 16, 12, 2)
    # corners are exactly scaled original values (align_corners=True)
    np.testing.assert_allclose(out[:, 0, 0, 0], flow[:, 0, 0, 0] * 2, rtol=1e-5)
    np.testing.assert_allclose(out[:, 0, 0, 1], flow[:, 0, 0, 1] * 2, rtol=1e-5)


def test_warp2d_v2_matches_oracle_interpret():
    """warp2d_v2 (channel-blocked DMA kernel) vs the jnp gather oracle and
    the v1 adjoint, in TPU interpret mode on CPU (tiny shapes)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from depthinspace_tpu.ops.sampling import warp as warp_oracle
    from depthinspace_tpu.ops.pallas.warp_kernel import warp2d
    from depthinspace_tpu.ops.pallas.warp2d_v2 import warp2d_v2

    M, H, W, C = 2, 16, 12, 4
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-5, 5, (M, H, W, 2)).astype(np.float32))
    g = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        ref = jax.jit(lambda i, f: warp_oracle(i, f, padding="zeros"))(
            img, flow)
        out = jax.jit(lambda i, f: warp2d_v2(i, f, 16))(img, flow)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        _, vjp2 = jax.vjp(lambda i: warp2d_v2(i, flow, 16), img)
        _, vjp1 = jax.vjp(lambda i: warp2d(i, flow, 16), img)
        np.testing.assert_allclose(np.asarray(vjp2(g)[0]),
                                   np.asarray(vjp1(g)[0]),
                                   rtol=1e-5, atol=1e-5)


def test_warp2d_v2_bf16_interpret():
    """bf16 img path: bf16 DMA + f32 weights/accumulation must track the
    f32 kernel within bf16 quantization, fwd and bwd, and preserve dtypes."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from depthinspace_tpu.ops.pallas.warp2d_v2 import warp2d_v2

    M, H, W, C = 2, 16, 12, 4
    rng = np.random.RandomState(5)
    img32 = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))
    img16 = img32.astype(jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-5, 5, (M, H, W, 2)).astype(np.float32))
    g = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        ref = jax.jit(lambda i, f: warp2d_v2(i, f, 16))(img32, flow)
        out = jax.jit(lambda i, f: warp2d_v2(i, f, 16))(img16, flow)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), rtol=0, atol=1.5e-2)
        _, vjp32 = jax.vjp(lambda i: warp2d_v2(i, flow, 16), img32)
        _, vjp16 = jax.vjp(lambda i: warp2d_v2(i, flow, 16), img16)
        g16 = vjp16(g.astype(jnp.bfloat16))[0]
        assert g16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g16, np.float32),
                                   np.asarray(vjp32(g)[0]),
                                   rtol=0, atol=3e-2)


def test_warp2d_pairs_matches_v2_interpret():
    """warp2d_pairs (in-kernel source gather) vs warp2d_v2 on explicitly
    stacked sources: same outputs per pair, and the feat gradient equals
    the per-source sum of v2's pair gradients.  TPU interpret mode on CPU."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from depthinspace_tpu.ops.pallas.warp2d_v2 import warp2d_v2
    from depthinspace_tpu.ops.pallas.warp2d_pairs import warp2d_pairs

    S, H, W, C = 4, 16, 12, 4
    # all-pairs track layout: target-major (i, j != i), every source 3 times
    pairs = [(i, j) for i in range(S) for j in range(S) if j != i]
    src_idx = tuple(j for _, j in pairs)
    M = len(pairs)
    rng = np.random.RandomState(11)
    feat = jnp.asarray(rng.rand(S, H, W, C).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-5, 5, (M, H, W, 2)).astype(np.float32))
    g = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        stacked = jnp.stack([feat[j] for j in src_idx])
        ref = jax.jit(lambda s, f: warp2d_v2(s, f, 16))(stacked, flow)
        out = jax.jit(lambda x, f: warp2d_pairs(x, f, src_idx, 16))(feat, flow)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # gradient: pairs kernel accumulates per source; oracle = stack VJP
        _, vjp_p = jax.vjp(lambda x: warp2d_pairs(x, flow, src_idx, 16), feat)
        _, vjp_s = jax.vjp(
            lambda x: warp2d_v2(jnp.stack([x[j] for j in src_idx]), flow, 16),
            feat)
        np.testing.assert_allclose(np.asarray(vjp_p(g)[0]),
                                   np.asarray(vjp_s(g)[0]),
                                   rtol=1e-5, atol=1e-5)

    # bf16 path: dtype preserved, values track f32 within quantization
    with pltpu.force_tpu_interpret_mode():
        out16 = jax.jit(lambda x, f: warp2d_pairs(x, f, src_idx, 16))(
            feat.astype(jnp.bfloat16), flow)
        assert out16.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out16, np.float32),
                                   np.asarray(out), rtol=0, atol=1.5e-2)
