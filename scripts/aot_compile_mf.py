#!/usr/bin/env python
"""Compile (but do not run) an MF train-step variant for the TPU target.

Populates the persistent compilation cache and prints the compiled memory
analysis, so variants can be compiled while another job owns the chip and
measured later with a cache hit.  ``--flow_source pred --augment --wire``
reproduces the WORKER-context graph (in-graph pred flow from the primary
disparities + device augmentation + u16 wire batch) whose bs=4 bf16
noremat variant OOM'd in round 4 — compare its footprint against the
bench-context graph (defaults: file flow, no augment, f32 batch).

Usage: python scripts/aot_compile_mf.py [--bs 4] [--dtype bfloat16]
           [--noremat] [--flow_source file|pred] [--augment] [--wire]
           [--assert_hbm]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--noremat", action="store_true")
    ap.add_argument("--flow_source", default="file",
                    choices=["file", "pred"])
    ap.add_argument("--augment", action="store_true")
    ap.add_argument("--wire", action="store_true",
                    help="u16/int16 wire-encoded batch (the worker path)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches")
    ap.add_argument("--assert_hbm", action="store_true",
                    help="assert footprint < 15 GiB (v5e bound)")
    args = ap.parse_args()
    bs, use_remat = args.bs, not args.noremat

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
                    compute_dtype=jnp.dtype(args.dtype), use_remat=use_remat)
    ctx = make_loss_context(settings, track_length=tl,
                            flow_source=args.flow_source,
                            augment=args.augment)
    opt = optax.adam(1e-4)

    train_step, _, consts = _make_step_fns(model, ctx, opt, "multi_frame",
                                           accum_steps=args.accum)

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

    heavy = np.uint16 if args.wire else np.float32
    sds = lambda shape, dt=np.float32: jax.ShapeDtypeStruct(shape, dt)
    batch_abs = Batch(
        im=sds((tl, bs, H, W), heavy), ambient=sds((tl, bs, H, W), heavy),
        disp_gt=sds((tl, bs, H, W), heavy), R=sds((tl, bs, 3, 3)),
        t=sds((tl, bs, 3)),
        flow=(None if args.flow_source == "pred" else
              sds((tl, tl, bs, H, W, 2),
                  np.int16 if args.wire else np.float32)),
        primary_disp=sds((tl, bs, H, W), heavy))
    consts_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), consts)
    epoch_abs = jax.ShapeDtypeStruct((), jnp.float32)

    print(f"lowering MF train step: bs={bs} dtype={args.dtype} "
          f"remat={use_remat} flow={args.flow_source} "
          f"augment={args.augment} wire={args.wire} accum={args.accum}",
          flush=True)
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
        if args.assert_hbm:
            # off-hardware HBM bound for the production MF config (the one
            # with the OOM history): the TPU executable's footprint must
            # leave headroom under the 16 GiB v5e chip
            total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                     + mem.output_size_in_bytes)
            assert total < 15 * 2 ** 30, \
                f"MF step footprint {total / 2**30:.2f} GiB >= 15 GiB bound"
            print(f"HBM bound OK: {total / 2**30:.2f} GiB < 15 GiB")
    except Exception as e:
        if args.assert_hbm:
            raise
        print(f"memory_analysis unavailable: {e}")


if __name__ == "__main__":
    main()
