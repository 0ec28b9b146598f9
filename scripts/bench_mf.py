#!/usr/bin/env python
"""Measure the DIS-MF train step on the real TPU chip.

Usage: python scripts/bench_mf.py [bs] [dtype] [block_num]
Reports compile memory analysis + steps/sec (hard device->host sync).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    use_remat = not (len(sys.argv) > 4 and sys.argv[4] == "noremat")

    import jax
    import jax.numpy as jnp
    import optax

    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import FuseNet
    from depthinspace_tpu.train import TrainState, make_loss_context, build_steps

    enable_compilation_cache()

    H, W = 512, 432
    tl = 4
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]], np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)

    packed = "nopack" not in sys.argv
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, max_disp=128.0,
                    compute_dtype=jnp.dtype(dtype), use_remat=use_remat,
                    packed=packed)
    ctx = make_loss_context(settings, track_length=tl)
    opt = optax.adam(1e-4)

    zeros = jnp.zeros
    params = model.init(
        jax.random.key(0),
        zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
        zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
        zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, "multi_frame", mesh=None)

    rng = np.random.RandomState(0)
    batch = Batch(
        im=rng.rand(tl, bs, H, W).astype(np.float32),
        ambient=rng.rand(tl, bs, H, W).astype(np.float32),
        disp_gt=rng.uniform(1, 100, (tl, bs, H, W)).astype(np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (tl, bs, 3, 3)).copy(),
        t=rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32),
        flow=rng.uniform(-2, 2, (tl, tl, bs, H, W, 2)).astype(np.float32),
        primary_disp=rng.uniform(1, 100, (tl, bs, H, W)).astype(np.float32),
    )
    batch = jax.device_put(batch)
    epoch = jnp.asarray(0.0)

    print(f"config: bs={bs} dtype={dtype} {H}x{W} tl={tl} "
          f"remat={use_remat}", flush=True)
    t0 = time.perf_counter()
    state, comps = train_step(state, batch, epoch)
    np.asarray(comps)
    print(f"first step (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(2):
        state, comps = train_step(state, batch, epoch)
    np.asarray(comps)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, comps = train_step(state, batch, epoch)
    np.asarray(comps)
    dt = time.perf_counter() - t0
    print(f"steps/sec: {n_steps/dt:.4f}  ({dt/n_steps*1e3:.1f} ms/step)")
    print(f"loss comps: {np.asarray(comps)}")


if __name__ == "__main__":
    main()
