"""Break down the DIS-MF train step cost on the current backend.

    python scripts/profile_mf.py [mode ...]

Modes (default: fwd bwd loss):
  fwd       FuseNet forward only
  bwd       FuseNet forward+backward (sum-of-output cotangent)
  loss      mf_losses forward+backward given fixed net outputs
  blocks=N  override block_num (cost scaling per fusion block)
  bs=N, dtype=D, noremat
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    args = sys.argv[1:]
    modes = [a for a in args if "=" not in a and a != "noremat"] or \
        ["fwd", "bwd", "loss"]
    kv = dict(a.split("=", 1) for a in args if "=" in a)
    bs = int(kv.get("bs", 4))
    dtype = kv.get("dtype", "bfloat16")
    block_num = int(kv.get("blocks", 4))
    use_remat = "noremat" not in args

    import jax
    import jax.numpy as jnp

    from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import FuseNet
    from depthinspace_tpu.train import make_loss_context
    from depthinspace_tpu.train.objective import mf_losses
    from depthinspace_tpu.ops import disp_to_depth

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} bs={bs} dtype={dtype} "
          f"blocks={block_num} remat={use_remat}", flush=True)

    H, W = 512, 432
    tl = 4
    K = np.array([[435.2, 0, 216.0], [0, 435.2, 256.0], [0, 0, 1]],
                 np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    ctx = make_loss_context(settings, track_length=tl)

    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, max_disp=128.0, block_num=block_num,
                    compute_dtype=jnp.dtype(dtype), use_remat=use_remat)

    rng = np.random.RandomState(0)
    ir = jnp.asarray(rng.rand(tl, bs, H, W, 2).astype(np.float32))
    amb = jnp.asarray(rng.rand(tl, bs, H, W, 1).astype(np.float32))
    pdisp = jnp.asarray(rng.uniform(1, 100, (tl, bs, H, W, 1))
                        .astype(np.float32))
    pdepth = disp_to_depth(pdisp, ctx.focal_length, ctx.baseline)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (tl, bs, 3, 3))
    t = jnp.asarray(rng.uniform(-0.1, 0.1, (tl, bs, 3)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-2, 2, (tl, tl, bs, H, W, 2))
                       .astype(np.float32))
    params = model.init(jax.random.key(0), ir[:, :1], amb[:, :1],
                        pdisp[:, :1], pdepth[:, :1], R[:, :1], t[:, :1],
                        flow[:, :, :1])

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.tree.map(lambda x: np.asarray(x), out)
        print(f"{name}: first (compile+run) {time.perf_counter()-t0:.1f}s",
              flush=True)
        for _ in range(2):
            out = fn(*a)
        jax.tree.map(lambda x: np.asarray(x), out)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.tree.map(lambda x: np.asarray(x), out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)

    # inputs must be jit *arguments*: gathers/warps on closed-over jit
    # constants hit the pathological flat-gather lowering on this stack
    # (CLAUDE.md), which would taint every number here.
    if "fwd" in modes:
        fwd = jax.jit(lambda p, ir, amb, pdisp, pdepth, R, t, flow:
                      model.apply(p, ir, amb, pdisp, pdepth, R, t, flow))
        timeit("forward", fwd, params, ir, amb, pdisp, pdepth, R, t, flow)

    if "bwd" in modes:
        g = jax.jit(jax.grad(
            lambda p, ir, amb, pdisp, pdepth, R, t, flow: jnp.sum(
                model.apply(p, ir, amb, pdisp, pdepth, R, t, flow)
                .astype(jnp.float32))))
        timeit("forward+backward", g, params, ir, amb, pdisp, pdepth, R, t,
               flow)

    if "loss" in modes:
        batch = Batch(im=ir[..., 1], ambient=amb[..., 0],
                      disp_gt=pdisp[..., 0], R=R, t=t, flow=flow,
                      primary_disp=pdisp[..., 0])
        outs0 = jnp.asarray(rng.uniform(1, 100, (tl, bs, H, W, 1))
                            .astype(np.float32))

        consts = (ctx.cam, ctx.pattern_lcn)
        ctx_static = ctx._replace(cam=None, pattern_lcn=None)

        def loss_only(outs, batch, consts):
            cam, pat = consts
            total, _ = mf_losses(outs, batch,
                                 ctx_static._replace(cam=cam,
                                                     pattern_lcn=pat),
                                 train=True, epoch=jnp.asarray(0.0),
                                 rng=jax.random.key(0))
            return total

        timeit("losses fwd+bwd", jax.jit(jax.grad(loss_only)), outs0, batch,
               consts)


if __name__ == "__main__":
    main()
