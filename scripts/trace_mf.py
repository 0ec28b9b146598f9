"""Trace the DIS-MF train step (or forward only) and rank device ops.

    python scripts/trace_mf.py [fwd|step] [bs] [noremat]
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    use_remat = "noremat" not in sys.argv

    import jax
    import jax.numpy as jnp
    import optax
    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import FuseNet
    from depthinspace_tpu.train import (TrainState, make_loss_context,
                                        build_steps)
    from depthinspace_tpu.ops import disp_to_depth

    enable_compilation_cache()
    H, W = 512, 432
    tl = 4
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]],
                 np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    ctx = make_loss_context(settings, track_length=tl)
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, max_disp=128.0,
                    compute_dtype=jnp.bfloat16, use_remat=use_remat)
    rng = np.random.RandomState(0)
    zeros = jnp.zeros
    params = model.init(
        jax.random.key(0),
        zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
        zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
        zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2)))

    if mode == "fwd":
        ir = jnp.asarray(rng.rand(tl, bs, H, W, 2).astype(np.float32))
        amb = jnp.asarray(rng.rand(tl, bs, H, W, 1).astype(np.float32))
        pdisp = jnp.asarray(rng.uniform(1, 100, (tl, bs, H, W, 1))
                            .astype(np.float32))
        pdepth = disp_to_depth(pdisp, ctx.focal_length, ctx.baseline)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (tl, bs, 3, 3))
        t = jnp.asarray(rng.uniform(-0.1, 0.1, (tl, bs, 3))
                        .astype(np.float32))
        flow = jnp.asarray(rng.uniform(-2, 2, (tl, tl, bs, H, W, 2))
                           .astype(np.float32))
        fwd = jax.jit(lambda p: model.apply(p, ir, amb, pdisp, pdepth, R, t,
                                            flow))
        run = lambda: np.asarray(fwd(params))
    else:
        opt = optax.adam(1e-4)
        state = TrainState.create(params, opt, jax.random.key(1))
        train_step, _ = build_steps(model, ctx, opt, "multi_frame", None)
        batch = jax.device_put(Batch(
            im=rng.rand(tl, bs, H, W).astype(np.float32),
            ambient=rng.rand(tl, bs, H, W).astype(np.float32),
            disp_gt=rng.uniform(1, 100, (tl, bs, H, W)).astype(np.float32),
            R=np.broadcast_to(np.eye(3, dtype=np.float32),
                              (tl, bs, 3, 3)).copy(),
            t=rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32),
            flow=rng.uniform(-2, 2, (tl, tl, bs, H, W, 2)).astype(np.float32),
            primary_disp=rng.uniform(1, 100, (tl, bs, H, W))
            .astype(np.float32)))
        epoch = jnp.asarray(0.0)
        st = [state]

        def run():
            st[0], comps = train_step(st[0], batch, epoch)
            return np.asarray(comps)

    run()
    run()

    logdir = "/tmp/dis_trace_mf"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        run()

    agg = defaultdict(float)
    fam = defaultdict(lambda: [0.0, 0])    # name sans trailing .<id> digits
    for fp in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            name = e.get("name", "")
            if name.startswith("jit_") or name.startswith("$"):
                continue
            dur = e.get("dur", 0) / 1e3
            if dur > 0.3:
                agg[name[:110]] += dur
            # family aggregate over ALL events (incl. the <0.3 ms tail):
            # strip trailing ".<digits>" ids so fusion.1234 -> fusion
            base = re.sub(r"\.\d+$", "", name)
            # only count device-stream op events (skip host-side wrappers)
            if base and not base.startswith(("np.asarray", "PjitFunction",
                                             "jvp_")):
                f0 = fam[base[:80]]
                f0[0] += dur
                f0[1] += 1
    print("=== top individual ops (>0.3 ms) ===")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur:10.2f} ms  {name}")
    print("=== op families (ALL events, ids stripped) ===")
    for name, (dur, n) in sorted(fam.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{dur:10.2f} ms  x{n:4d}  {name}")


if __name__ == "__main__":
    main()
