"""Pre-populate the persistent XLA compile cache for the parity pipeline.

Lowers and compiles the EXACT jitted programs `parity_drive.sh` will
request — train + eval steps for DIS-SF, DIS-MF and DIS-FTSF at the parity
batch shapes, with the wire-encoded (uint16/int16) batch avals the loader
produces and --flow_source rigid — via the workers' own construction path
(train_step._jit / ._consts, train/steps.py:143-146).

NEGATIVE RESULT on the target TPU backend (round 3, STATUS.md/CLAUDE.md):
compile-cache keys are per-process there — identical HLO digests produce
different cache entries (~300 B of per-session metadata in the compile
options) — so cross-process prewarming does NOT shorten a later
train_val.py start on TPU.  Kept because it still works as designed on
CPU (tests, cache experiments) and documents the exact programs the
pipeline compiles.

Usage: python scripts/prewarm_parity.py [sf|mf|ftsf ...]  (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from depthinspace_tpu.utils.args import parse_args
from depthinspace_tpu.config import RunConfig
from depthinspace_tpu.train import SingleFrameWorker, MultiFrameWorker
from depthinspace_tpu.data.dataset import TrackDataset, collate, Batch
from depthinspace_tpu.data.wire import encode_batch

COMMON = ["--cmd", "retrain", "--flow_source", "rigid",
          "--test_batch_size", "16", "--test_frequency", "2"]
CONFIGS = {
    "sf": (SingleFrameWorker,
           ["--architecture", "single_frame", "--epochs", "30"] + COMMON),
    "mf": (MultiFrameWorker,
           ["--architecture", "multi_frame", "--epochs", "10",
            "--train_batch_size", "4", "--mf_remat", "false"] + COMMON),
    "ftsf": (SingleFrameWorker,
             ["--architecture", "single_frame", "--epochs", "10",
              "--use_pseudo_gt", "True"] + COMMON),
}


def sds(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), tree)


def u16(shape):
    return jax.ShapeDtypeStruct(shape, np.uint16)


def encoded_batch_avals(worker, bs, with_primary, with_pseudo):
    """Avals of one wire-encoded batch exactly as the loader emits it.

    Loads real samples with the worker's dataset flags, except
    primary_disp / pseudo_gt whose presave files may not exist yet at
    prewarm time — those are appended as synthetic avals (their wire
    encoding is uint16 at (tl, bs, H, W), data/wire.py:30,45).
    """
    paths = (worker.test_paths or worker.train_paths)[:bs]
    assert len(paths) == bs, f"need {bs} sample dirs, have {len(paths)}"
    ds = TrackDataset(worker.settings, paths, train=True, data_aug=False,
                      track_length=worker.cfg.track_length,
                      load_flow=False, load_primary=False,
                      load_pseudo_gt=False, data_type=worker.cfg.data_type)
    enc = encode_batch(collate([ds[i] for i in range(bs)]))
    tl = worker.cfg.track_length
    H, W = worker.imsize
    if with_primary:
        enc = enc._replace(primary_disp=np.zeros((tl, bs, H, W), np.uint16))
    if with_pseudo:
        enc = enc._replace(pseudo_gt=np.zeros((tl, bs, H, W), np.uint16))
    return sds(enc)


def prewarm(name):
    cls, argv = CONFIGS[name]
    cfg = RunConfig.from_args(parse_args(argv))
    worker = cls(cfg)
    with_primary = name == "mf"
    with_pseudo = name == "ftsf"

    state_abs = jax.eval_shape(worker.init_state)
    epoch_abs = jax.ShapeDtypeStruct((), np.float32)
    consts_abs = sds(worker.train_step._consts)

    train_bs = cfg.train_batch_size
    batch_abs = encoded_batch_avals(worker, train_bs, with_primary,
                                    with_pseudo)
    t0 = time.time()
    worker.train_step._jit.lower(
        state_abs, batch_abs, epoch_abs, consts_abs).compile()
    print(f"[{name}] train step (bs={train_bs}) compiled "
          f"in {time.time() - t0:.0f}s", flush=True)

    # eval program at the test batch size, plus at the train batch size
    # (the every-256-batches debug-image callback evaluates train batches,
    # train/worker.py:377-379)
    for bs in (cfg.test_batch_size, train_bs):
        eb = encoded_batch_avals(worker, bs, with_primary, with_pseudo)
        t0 = time.time()
        worker.eval_step._jit.lower(
            state_abs.params, eb, epoch_abs, consts_abs).compile()
        print(f"[{name}] eval step (bs={bs}) compiled "
              f"in {time.time() - t0:.0f}s", flush=True)


def main():
    names = sys.argv[1:] or ["sf", "mf", "ftsf"]
    for name in names:
        prewarm(name)
    print("prewarm done", flush=True)


if __name__ == "__main__":
    main()
