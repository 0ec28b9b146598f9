#!/usr/bin/env python
"""Benchmark: DIS-SF self-supervised training throughput on one chip.

Measures the full jitted training step — LCN preprocessing, DispNet forward,
census photometric + smoothness + 6-pair multi-view geometric losses,
backward, Adam — at the reference's headline configuration (512x432,
batch 8 tracks of 4 frames => 32 images/step; reference README.md:74,
BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The denominator used here is an engineering estimate of the reference
PyTorch pipeline on a 24 GB GPU at the same config — 2.0 train steps/sec
(eager per-phase execution with CUDA sync between phases, README-documented
hardware class). Treat vs_baseline as indicative until a measured reference
number exists.
"""
import json
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 2.0   # estimated reference throughput (see above)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.train import (TrainState, make_loss_context,
                                        build_steps)

    enable_compilation_cache()

    H, W = 512, 432
    tl, bs = 4, 8
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]], np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)

    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=tl)
    opt = optax.adam(1e-4)
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, "single_frame", mesh=None)

    rng = np.random.RandomState(0)
    batch = Batch(
        im=rng.rand(tl, bs, H, W).astype(np.float32),
        ambient=rng.rand(tl, bs, H, W).astype(np.float32),
        disp_gt=rng.uniform(1, 100, (tl, bs, H, W)).astype(np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (tl, bs, 3, 3)).copy(),
        t=rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32),
        flow=rng.uniform(-2, 2, (tl, tl, bs, H, W, 2)).astype(np.float32),
    )
    batch = jax.device_put(batch)
    epoch = jnp.asarray(0.0)

    # warmup (compile) — NOTE: on this backend jax.block_until_ready can
    # return before device execution finishes; a device->host transfer
    # (np.asarray) is the reliable synchronization point.
    for _ in range(3):
        state, comps = train_step(state, batch, epoch)
    np.asarray(comps)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, comps = train_step(state, batch, epoch)
    np.asarray(comps)       # hard sync
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    print(json.dumps({
        "metric": "DIS-SF train steps/sec (512x432, batch 8x4 frames, full loss stack)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
