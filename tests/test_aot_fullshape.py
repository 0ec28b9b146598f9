"""Production-shape sharded compile check (VERDICT r1 item 10).

AOT-lowers and compiles the data-parallel DIS-SF train step at the real
512x432 resolution on the 8-virtual-device CPU mesh — no execution, but
layout/sharding/memory regressions at production shapes surface here
instead of on TPU hardware.  The persistent compilation cache
(conftest.py) makes re-runs cheap; the first run pays a multi-minute CPU
XLA compile.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from depthinspace_tpu.data.dataset import Batch
from depthinspace_tpu.data.settings import Settings
from depthinspace_tpu.data.fixture import make_dot_pattern
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.parallel import make_mesh
from depthinspace_tpu.train import TrainState, make_loss_context
from depthinspace_tpu.train.steps import build_steps_aot


def test_sf_fullshape_sharded_aot_compile():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest provides them)")
    mesh = make_mesh(jax.devices()[:8])

    H, W = 512, 432
    tl, bs = 4, 8
    K = np.array([[435.2, 0, W / 2], [0, 435.2, H / 2], [0, 0, 1]],
                 np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=tl)
    opt = optax.adam(1e-4)

    batch = Batch(
        im=np.zeros((tl, bs, H, W), np.float32),
        ambient=np.zeros((tl, bs, H, W), np.float32),
        disp_gt=np.zeros((tl, bs, H, W), np.float32),
        R=np.zeros((tl, bs, 3, 3), np.float32),
        t=np.zeros((tl, bs, 3), np.float32),
        flow=np.zeros((tl, tl, bs, H, W, 2), np.float32),
    )
    state = jax.eval_shape(
        lambda k: TrainState.create(
            model.init(k, jnp.zeros((1, H, W, 2))), opt, jax.random.key(1)),
        jax.random.key(0))
    lowered = build_steps_aot(model, ctx, opt, "single_frame", mesh,
                              state, batch)
    compiled = lowered.compile()
    # the compiled executable must exist and report a finite temp footprint
    mem = compiled.memory_analysis()
    assert mem is None or getattr(mem, "temp_size_in_bytes", 0) >= 0


def test_mf_fullshape_sharded_aot_compile():
    """DIS-MF at the production config with the OOM history (512x432, bs=4,
    bf16, no remat — CLAUDE.md/STATUS): AOT-compile the sharded train step
    off-hardware and bound its compiled memory footprint.  The CPU backend
    swaps the Pallas warp kernels for the jnp fallback (ops/resample.py),
    so kernel scratch is not covered — activation/temp sizing and the
    sharding layout are."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest provides them)")
    from depthinspace_tpu.models import FuseNet
    mesh = make_mesh(jax.devices()[:8])

    H, W = 512, 432
    tl, bs = 4, 8        # bs 8 over the 8-device mesh = the per-chip bs=4
    K = np.array([[435.2, 0, W / 2], [0, 435.2, H / 2], [0, 0, 1]],
                 np.float32)
    settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                        baseline=0.025, K=K)
    model = FuseNet(imsize=(H, W), K=tuple(map(tuple, K.tolist())),
                    track_length=tl, max_disp=128.0,
                    compute_dtype=jnp.bfloat16, use_remat=False)
    ctx = make_loss_context(settings, track_length=tl)
    opt = optax.adam(1e-4)

    sds = lambda shape: np.zeros(shape, np.float32)
    batch = Batch(
        im=sds((tl, bs, H, W)), ambient=sds((tl, bs, H, W)),
        disp_gt=sds((tl, bs, H, W)), R=sds((tl, bs, 3, 3)),
        t=sds((tl, bs, 3)), flow=sds((tl, tl, bs, H, W, 2)),
        primary_disp=sds((tl, bs, H, W)))
    zeros = jnp.zeros
    state = jax.eval_shape(
        lambda k: TrainState.create(
            model.init(k, zeros((tl, 1, H, W, 2)), zeros((tl, 1, H, W, 1)),
                       zeros((tl, 1, H, W, 1)), jnp.ones((tl, 1, H, W, 1)),
                       jnp.broadcast_to(jnp.eye(3), (tl, 1, 3, 3)),
                       zeros((tl, 1, 3)), zeros((tl, tl, 1, H, W, 2))),
            opt, jax.random.key(1)),
        jax.random.key(0))
    lowered = build_steps_aot(model, ctx, opt, "multi_frame", mesh,
                              state, batch)
    compiled = lowered.compile()
    # No tight memory bound here: the CPU fallback materializes the warp
    # tap enumeration densely (ops/resample.py jnp path), so its temps are
    # ~an order of magnitude above the Pallas/TPU program's.  The HBM
    # bound for the real TPU executable is asserted by
    # scripts/aot_compile_mf.py --assert_hbm (compile-service only, no
    # chip execution); this test guards that the full-shape sharded MF
    # graph lowers and compiles at all.
    mem = compiled.memory_analysis()
    assert mem is None or getattr(mem, "temp_size_in_bytes", 0) >= 0
