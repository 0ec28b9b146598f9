"""Subprocess body for the 2-process multihost test (test_parallel.py).

Run as:  python tests/_multihost_prog.py <process_id> <out_json>

Each of the two processes owns 4 virtual CPU devices (8-device global
mesh), loads its own half of a deterministic batch, assembles the global
batch with put_batch_global (the nproc>1 branch,
parallel/multihost.py:100-109), runs ONE sharded SF train step, and dumps
the loss components + a per-leaf parameter digest for the parent test to
compare against the single-process result.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, out_path, port = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from depthinspace_tpu.parallel import multihost as mh
    mh.init_multihost(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert mh.is_primary() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.data.settings import Settings
    from depthinspace_tpu.data.fixture import make_dot_pattern
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.parallel import make_mesh, replicate_pytree
    from depthinspace_tpu.train import (TrainState, make_loss_context,
                                        build_steps)

    H, W, TL, BS = 32, 24, 4, 8
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    ctx = make_loss_context(settings, track_length=TL)
    model = DispNet(max_disp=128.0)

    rng = np.random.RandomState(0)
    full = Batch(
        im=rng.rand(TL, BS, H, W).astype(np.float32),
        ambient=rng.rand(TL, BS, H, W).astype(np.float32),
        disp_gt=rng.uniform(1, 20, (TL, BS, H, W)).astype(np.float32),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (TL, BS, 3, 3)).copy(),
        t=rng.uniform(-0.05, 0.05, (TL, BS, 3)).astype(np.float32),
        flow=rng.uniform(-1, 1, (TL, TL, BS, H, W, 2)).astype(np.float32),
    )
    lo, hi = mh.process_batch_bounds(BS)
    assert (hi - lo) == BS // 2 and lo == pid * (BS // 2)
    local = Batch(**{
        k: (None if getattr(full, k) is None else
            np.take(getattr(full, k), np.arange(lo, hi),
                    axis=2 if k == "flow" else 1))
        for k in Batch._fields})

    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = mh.put_batch_global(local, mesh, global_batch_size=BS)

    opt = optax.sgd(1e-2)
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(1))
    state = replicate_pytree(state, mesh)   # multi-process-safe replication
    train_step, _ = build_steps(model, ctx, opt, "single_frame", mesh)
    state, comps = train_step(state, batch, jnp.asarray(0.0))

    flat, _ = jax.tree.flatten(jax.tree.map(np.asarray,
                                            jax.device_get(state.params)))
    digest = [[float(np.abs(a).mean()), float(a.sum())] for a in flat]
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"comps": np.asarray(comps).tolist(),
                       "digest": digest}, f)


if __name__ == "__main__":
    main()
