"""Trace one full DIS-SF train step and rank device ops by time."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.data.dataset import Batch
from depthinspace_tpu.data.settings import Settings
from depthinspace_tpu.data.fixture import make_dot_pattern
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train import TrainState, make_loss_context, build_steps

enable_compilation_cache()

H, W = 512, 432
tl, bs = 4, 8
K = np.array([[435.2, 0, 216.], [0, 435.2, 256.], [0, 0, 1]], np.float32)
settings = Settings(imsize=(H, W), pattern=make_dot_pattern(H, W),
                    baseline=0.025, K=K)
model = DispNet(max_disp=128.0)
ctx = make_loss_context(settings, track_length=tl)
opt = optax.adam(1e-4)
params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
state = TrainState.create(params, opt, jax.random.key(1))
train_step, _ = build_steps(model, ctx, opt, "single_frame", None)

rng = np.random.RandomState(0)
batch = Batch(im=rng.rand(tl, bs, H, W).astype(np.float32),
              ambient=rng.rand(tl, bs, H, W).astype(np.float32),
              disp_gt=rng.uniform(1, 100, (tl, bs, H, W)).astype(np.float32),
              R=np.broadcast_to(np.eye(3, dtype=np.float32),
                                (tl, bs, 3, 3)).copy(),
              t=rng.uniform(-.1, .1, (tl, bs, 3)).astype(np.float32),
              flow=rng.uniform(-2, 2, (tl, tl, bs, H, W, 2)).astype(np.float32))
batch = jax.device_put(batch)
epoch = jnp.asarray(0.0)

state, comps = train_step(state, batch, epoch)
jax.block_until_ready(comps)

logdir = "/tmp/dis_trace_step"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state, comps = train_step(state, batch, epoch)
    jax.block_until_ready(comps)

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
agg = defaultdict(float)
total = 0.0
for fp in files:
    with gzip.open(fp, "rt") as f:
        data = json.load(f)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        # device ops live on TensorCore lanes and carry 'long_name' or hlo
        name = e.get("name", "")
        if name.startswith("jit_") or "py_funcs" in str(args):
            continue
        dur = e.get("dur", 0) / 1e3
        tid_name = str(e.get("pid", "")) + str(e.get("tid", ""))
        hlo = args.get("long_name") or args.get("hlo_op") or name
        if dur > 0.3 and not name.startswith("$"):
            agg[name[:100]] += dur
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{dur:10.2f} ms  {name}")
