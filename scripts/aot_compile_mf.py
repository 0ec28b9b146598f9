#!/usr/bin/env python
"""Compile (but do not run) an MF train-step variant for the TPU target.

Populates the persistent compilation cache and prints the compiled memory
analysis, so variants can be compiled while another job owns the chip and
measured later with a cache hit.

Usage: python scripts/aot_compile_mf.py [bs] [dtype] [remat|noremat]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    use_remat = not (len(sys.argv) > 3 and sys.argv[3] == "noremat")

    import jax
    import jax.numpy as jnp
    import optax

    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import FuseNet
    from depthinspace_tpu.train import TrainState, make_loss_context
    from depthinspace_tpu.train.steps import _make_step_fns

    enable_compilation_cache()

    H, W, tl = 512, 432, 4
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]],
                 np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, max_disp=128.0,
                    compute_dtype=jnp.dtype(dtype), use_remat=use_remat)
    ctx = make_loss_context(settings, track_length=tl)
    opt = optax.adam(1e-4)

    train_step, _, consts = _make_step_fns(model, ctx, opt, "multi_frame")

    zeros = jnp.zeros
    params_abs = jax.eval_shape(
        lambda k: model.init(
            k, zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
            zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
            jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
            zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2))),
        jax.random.key(0))
    state_abs = jax.eval_shape(
        lambda p: TrainState.create(p, opt, jax.random.key(1)), params_abs)

    sds = lambda shape: jax.ShapeDtypeStruct(shape, np.float32)
    batch_abs = Batch(
        im=sds((tl, bs, H, W)), ambient=sds((tl, bs, H, W)),
        disp_gt=sds((tl, bs, H, W)), R=sds((tl, bs, 3, 3)),
        t=sds((tl, bs, 3)), flow=sds((tl, tl, bs, H, W, 2)),
        primary_disp=sds((tl, bs, H, W)))
    consts_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), consts)
    epoch_abs = jax.ShapeDtypeStruct((), jnp.float32)

    print(f"lowering MF train step: bs={bs} dtype={dtype} "
          f"remat={use_remat}", flush=True)
    t0 = time.time()
    lowered = jax.jit(train_step, donate_argnums=(0,)).lower(
        state_abs, batch_abs, epoch_abs, consts_abs)
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"temp {mem.temp_size_in_bytes/2**30:.2f}G  "
              f"arg {mem.argument_size_in_bytes/2**30:.2f}G  "
              f"out {mem.output_size_in_bytes/2**30:.2f}G")
        if "--assert_hbm" in sys.argv:
            # off-hardware HBM bound for the production MF config (the one
            # with the OOM history): the TPU executable's footprint must
            # leave headroom under the 16 GiB v5e chip
            total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                     + mem.output_size_in_bytes)
            assert total < 15 * 2 ** 30, \
                f"MF step footprint {total / 2**30:.2f} GiB >= 15 GiB bound"
            print(f"HBM bound OK: {total / 2**30:.2f} GiB < 15 GiB")
    except Exception as e:
        if "--assert_hbm" in sys.argv:
            raise
        print(f"memory_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
