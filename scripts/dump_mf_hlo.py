"""Dump the compiled DIS-MF train-step HLO (cache-hit compile) and
summarize the named fusions so trace entries can be mapped to source ops.

    python scripts/dump_mf_hlo.py [bs] [noremat] [> /tmp/mf_hlo.txt]
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
    params = jax.eval_shape(lambda k: model.init(
        k, zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
        zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
        jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
        zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2))), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    opt = optax.adam(1e-4)
    state = TrainState.create(params, opt, jax.random.key(1))
    train_step, _ = build_steps(model, ctx, opt, "multi_frame", None)
    batch = Batch(
        im=np.zeros((tl, bs, H, W), np.float32),
        ambient=np.zeros((tl, bs, H, W), np.float32),
        disp_gt=np.ones((tl, bs, H, W), np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32),
                          (tl, bs, 3, 3)).copy(),
        t=np.zeros((tl, bs, 3), np.float32),
        flow=np.zeros((tl, tl, bs, H, W, 2), np.float32),
        primary_disp=np.ones((tl, bs, H, W), np.float32))
    epoch = jnp.asarray(0.0)
    lowered = train_step._jit.lower(state, batch, epoch, train_step._consts)
    txt = lowered.compile().as_text()
    with open("/tmp/mf_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO chars: {len(txt)}; wrote /tmp/mf_hlo.txt")

    # summarize each named fusion: root op line
    for m in re.finditer(r"^\s*%?(fusion[.\w]*) = (.*)$", txt, re.M):
        name, rhs = m.group(1), m.group(2)
        print(f"{name}: {rhs[:200]}")


if __name__ == "__main__":
    main()
