"""Decompose photometric/geometric loss cost on TPU, piece by piece."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.ops import lcn, census_sad, bilinear_sample
from depthinspace_tpu.ops.pallas import census_sad_pallas
from depthinspace_tpu.losses import photometric_loss
from depthinspace_tpu.losses.photometric import warp_pattern_by_disparity
from depthinspace_tpu.losses.geometric import (CameraGeometry,
                                               flow_consistency_sf,
                                               geometric_loss_sf,
                                               pairwise_indices)

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

N, H, W = 32, 512, 432
tl, bs = 4, 8
rng = np.random.RandomState(0)
im = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
amb = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))
pattern = jnp.asarray(rng.rand(H, W).astype(np.float32))
flow = jnp.asarray(rng.uniform(-8, 8, (tl, tl, bs, H, W, 2)).astype(np.float32))
K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]], np.float32)
cam = CameraGeometry.create(K, H, W)
R = jnp.broadcast_to(jnp.eye(3), (tl, bs, 3, 3)).astype(jnp.float32)
t = jnp.asarray(rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32))
depth_tr = (0.025 * 435.2) / (disp.reshape(tl, bs, H, W) + 1e-6)
amb_tr = amb.reshape(tl, bs, H, W)


def bench(label, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:46s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms",
          flush=True)


bench("warp only", jax.jit(lambda d: warp_pattern_by_disparity(pattern, d)),
      disp)
bench("census scan only", jax.jit(lambda a: census_sad(a, im, 9, 0.5)), im)
bench("census pallas only",
      jax.jit(lambda a: census_sad_pallas(a, im, 9, 0.5)), im)
bench("warp+census mean", jax.jit(
    lambda d: jnp.mean(census_sad(warp_pattern_by_disparity(pattern, d),
                                  im, 9, 0.5))), disp)
bench("full photometric (std mask)", jax.jit(
    lambda d: photometric_loss(d, im, pattern, std=amb)[0]), disp)
bench("full photometric w/ pallas census", jax.jit(
    lambda d: photometric_loss(d, im, pattern, std=amb,
                               census_fn=census_sad_pallas)[0]), disp)

# geometric decomposition
bench("geo single pair (no vmap)", jax.jit(
    lambda d: flow_consistency_sf(cam, d[0], d[1], R[0], t[0], R[1], t[1],
                                  flow[0, 1], flow[1, 0], amb_tr[0],
                                  amb_tr[1])), depth_tr)
bench("geo 6 pairs vmapped", jax.jit(
    lambda d: geometric_loss_sf(cam, d, R, t, flow, amb_tr)), depth_tr)


def geo_unrolled(d):
    ii, jj = pairwise_indices(tl)
    total = 0.0
    for i, j in zip(ii, jj):
        total += flow_consistency_sf(cam, d[i], d[j], R[i], t[i], R[j], t[j],
                                     flow[i, j], flow[j, i], amb_tr[i],
                                     amb_tr[j])
    return total


bench("geo 6 pairs python-unrolled", jax.jit(geo_unrolled), depth_tr)
bench("geo 6 pairs vmapped grad", jax.jit(jax.grad(
    lambda d: geometric_loss_sf(cam, d, R, t, flow, amb_tr))), depth_tr)

bench("full photometric grad", jax.jit(jax.grad(
    lambda d: photometric_loss(d, im, pattern, std=amb)[0])), disp)
