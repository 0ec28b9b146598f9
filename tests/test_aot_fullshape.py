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
