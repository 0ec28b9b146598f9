"""End-to-end smoke: train DIS-SF on a procedural fixture dataset.

Usage:  python examples/train_sf_fixture.py [--steps 30] [--mesh]

Generates a micro synthetic dataset (analytic structured-light renderer),
builds the DispNet model + the full self-supervised loss stack
(photometric census + smoothness + multi-view geometric), and runs a few
data-parallel training steps, printing the loss trajectory.
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("SMOKE_PLATFORM", "cpu"))
if "--mesh" in os.sys.argv and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np
import optax

# The axon sitecustomize force-registers the TPU backend regardless of the
# env var; an explicit config update is what actually pins the platform.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache
from depthinspace_tpu.data import (TrackDataset, DataLoader, load_settings,
                                   generate_dataset)
from depthinspace_tpu.models import DispNet
from depthinspace_tpu.train.objective import make_loss_context
from depthinspace_tpu.train.steps import build_steps
from depthinspace_tpu.train.state import TrainState
from depthinspace_tpu.parallel import make_mesh, put_batch, replicated


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel over all visible devices")
    ap.add_argument("--imsize", type=int, nargs=2, default=(64, 56))
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    enable_compilation_cache()
    data_dir = tempfile.mkdtemp(prefix="dis_fixture_")
    print(f"generating fixture dataset in {data_dir} ...")
    generate_dataset(data_dir, n_samples=8, imsize=tuple(args.imsize), seed=3)

    from pathlib import Path
    settings = load_settings(Path(data_dir) / "settings.pkl")
    ds = TrackDataset(settings, sorted(str(p) for p in Path(data_dir).glob("0*")),
                      train=True, data_aug=True, load_flow=True)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        num_workers=2, drop_last=False)

    mesh = make_mesh() if args.mesh else None
    print(f"devices: {jax.devices()}  mesh: {mesh}")

    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4)
    H, W = settings.imsize
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    opt = optax.adam(1e-4)
    state = TrainState.create(params, opt, jax.random.key(1))
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    train_step, eval_step = build_steps(model, ctx, opt, "single_frame", mesh)

    step = 0
    t_start = time.time()
    first_loss = last_loss = None
    while step < args.steps:
        for batch in loader:
            if step >= args.steps:
                break
            batch = put_batch(batch, mesh) if mesh is not None else batch
            state, comps = train_step(state, batch, jnp.asarray(0))
            loss = float(jnp.sum(comps))
            if first_loss is None:
                first_loss = loss
            last_loss = loss
            if step % 5 == 0 or step == args.steps - 1:
                print(f"step {step:4d}  loss={loss:.5f}  "
                      f"components={np.asarray(comps).round(4)}")
            step += 1
    dt = time.time() - t_start
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.2f} steps/s incl. compile)")
    print(f"loss: {first_loss:.5f} -> {last_loss:.5f}")
    assert last_loss < first_loss, "loss did not decrease!"
    print("OK: loss decreased")


if __name__ == "__main__":
    main()
