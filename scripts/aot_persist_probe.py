"""Probe: can compiled TPU executables be persisted ACROSS processes?

Round-3 finding: the XLA persistent compile cache keys are per-process on
this backend (identical HLO digests -> different cache entries), so every
pipeline stage pays its compiles again.  VERDICT r3 item 8 asks whether
`jax.experimental.serialize_executable` (pickle of the loaded executable)
side-steps the cache entirely: serialize the *compiled* object in process
A, deserialize_and_load in process B, run without any compile-service
round trip.

Usage:
  python scripts/aot_persist_probe.py save [--big]   # compile + serialize
  python scripts/aot_persist_probe.py load [--big]   # deserialize + run
  python scripts/aot_persist_probe.py both           # save, then spawn load

Prints phase timings; the verdict is the load process's time-to-first-run
vs its compile-from-scratch time.
"""

import argparse
import pickle
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

OUT = Path("/tmp/aot_probe")


def make_fn(big: bool):
    import jax
    import jax.numpy as jnp

    if not big:
        def f(x, y):
            return (jnp.tanh(x @ y) + x[:, :1]).sum(axis=1)
        args = (jnp.ones((256, 256)), jnp.ones((256, 256)))
        return f, args
    # big: the real SF train step at parity shapes
    import numpy as np
    import optax
    from depthinspace_tpu.data import load_settings
    from depthinspace_tpu.data.dataset import Batch
    from depthinspace_tpu.models import DispNet
    from depthinspace_tpu.train.objective import make_loss_context
    from depthinspace_tpu.train.steps import _make_step_fns
    from depthinspace_tpu.train.state import TrainState

    settings = load_settings(Path("/root/repo/dataset/settings.pkl"))
    H, W = settings.imsize
    model = DispNet(max_disp=128.0)
    ctx = make_loss_context(settings, track_length=4, flow_source="rigid",
                            augment=True)
    opt = optax.adam(1e-4)
    train_step, _, consts = _make_step_fns(model, ctx, opt, "single_frame")
    params = model.init(jax.random.key(0), jnp.zeros((1, H, W, 2)))
    state = TrainState.create(params, opt, jax.random.key(0))
    rng = np.random.RandomState(0)
    u16 = lambda shape: rng.randint(0, 60000, shape).astype(np.uint16)
    bs = 8
    batch = Batch(im=u16((4, bs, H, W)), ambient=u16((4, bs, H, W)),
                  disp_gt=u16((4, bs, H, W)),
                  R=np.broadcast_to(np.eye(3, dtype=np.float32),
                                    (4, bs, 3, 3)).copy(),
                  t=rng.uniform(-0.1, 0.1, (4, bs, 3)).astype(np.float32))
    epoch = jnp.asarray(0.0, jnp.float32)
    return train_step, (state, batch, epoch, consts)


def save(big: bool):
    import jax
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    fn, args = make_fn(big)
    print(f"[save] build: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    print(f"[save] lower: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[save] compile: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    payload = se.serialize(compiled)
    OUT.mkdir(exist_ok=True)
    (OUT / ("big.pkl" if big else "small.pkl")).write_bytes(
        pickle.dumps(payload))
    print(f"[save] serialize+write: {time.time() - t0:.1f}s "
          f"({(OUT / ('big.pkl' if big else 'small.pkl')).stat().st_size/1e6:.1f} MB)",
          flush=True)

    t0 = time.time()
    out = compiled(*args)
    import numpy as np
    np.asarray(jax.tree.leaves(out)[0])
    print(f"[save] first run: {time.time() - t0:.1f}s", flush=True)


def load(big: bool):
    import numpy as np
    import jax
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    fn, args = make_fn(big)
    print(f"[load] build args: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    payload = pickle.loads(
        (OUT / ("big.pkl" if big else "small.pkl")).read_bytes())
    compiled = se.deserialize_and_load(*payload)
    print(f"[load] deserialize_and_load: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"[load] first run: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"[load] second run: {time.time() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["save", "load", "both"])
    ap.add_argument("--big", action="store_true")
    args = ap.parse_args()
    if args.mode == "save":
        save(args.big)
    elif args.mode == "load":
        load(args.big)
    else:
        flag = ["--big"] if args.big else []
        subprocess.run([sys.executable, __file__, "save"] + flag, check=True)
        subprocess.run([sys.executable, __file__, "load"] + flag, check=True)


if __name__ == "__main__":
    main()
