"""Break down DIS-SF train-step time by component on the current backend.

    python scripts/profile_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.data.dataset import Batch
from depthinspace_tpu.data.settings import Settings
from depthinspace_tpu.data.fixture import make_dot_pattern
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train import make_loss_context
from depthinspace_tpu.train.objective import preprocess_images
from depthinspace_tpu.ops import lcn, disp_to_depth
from depthinspace_tpu.losses import (photometric_loss, smoothness_loss,
                                     geometric_loss_sf)

enable_compilation_cache()
print("backend:", jax.default_backend())

H, W = 512, 432
tl, bs = 4, 8
N = tl * bs
K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]], np.float32)
settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                    baseline=0.025, K=K)
ctx_pattern, _ = lcn(jnp.asarray(settings.pattern_gray()), 5, 0.05)

rng = np.random.RandomState(0)
im = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
amb = jnp.asarray(rng.rand(N, H, W).astype(np.float32))
disp = jnp.asarray(rng.uniform(1, 100, (N, H, W)).astype(np.float32))
flow = jnp.asarray(rng.uniform(-2, 2, (tl, tl, bs, H, W, 2)).astype(np.float32))
R = jnp.broadcast_to(jnp.eye(3), (tl, bs, 3, 3)).astype(jnp.float32)
t = jnp.asarray(rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32))

from depthinspace_tpu.losses.geometric import CameraGeometry
cam = CameraGeometry.create(K, H, W)

model = DispNet(max_disp=128.0)
params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))


def bench(label, f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt * 1e3:9.2f} ms")
    return dt


x2 = jnp.stack([im, im], -1)
bench("model fwd", jax.jit(lambda p, x: model.apply(p, x)), params, x2)

bench("model fwd+bwd (sum loss)",
      jax.jit(jax.grad(lambda p: sum(jnp.mean(o)
                                     for o in model.apply(p, x2)))), params)

bench("lcn(im)", jax.jit(lambda a: lcn(a, 5, 0.05)[0]), im)

ph = jax.jit(lambda d: photometric_loss(d, im, ctx_pattern, std=amb)[0])
bench("photometric fwd (1 scale)", ph, disp)
bench("photometric fwd+bwd", jax.jit(jax.grad(
    lambda d: photometric_loss(d, im, ctx_pattern, std=amb)[0])), disp)

bench("smoothness fwd+bwd",
      jax.jit(jax.grad(lambda d: smoothness_loss(d, amb))), disp)

depth_tr = disp_to_depth(disp.reshape(tl, bs, H, W), 435.2, 0.025)
ge = jax.jit(lambda d: geometric_loss_sf(cam, d, R, t, flow,
                                         amb.reshape(tl, bs, H, W)))
bench("geometric fwd (6 pairs)", ge, depth_tr)
bench("geometric fwd+bwd", jax.jit(jax.grad(
    lambda d: geometric_loss_sf(cam, d, R, t, flow,
                                amb.reshape(tl, bs, H, W)))), depth_tr)

# pallas census vs scan census
from depthinspace_tpu.ops import census_sad
from depthinspace_tpu.ops.pallas import census_sad_pallas
pat = jnp.broadcast_to(ctx_pattern[None], (N, H, W))
bench("census scan fwd", jax.jit(lambda: census_sad(pat, im, 9, 0.5)))
if jax.default_backend() == "tpu":
    bench("census pallas fwd",
          jax.jit(lambda: census_sad_pallas(pat, im, 9, 0.5)))
    err = jnp.abs(census_sad(pat, im, 9, 0.5)
                  - census_sad_pallas(pat, im, 9, 0.5)).max()
    print("census pallas vs scan max err:", float(err))
