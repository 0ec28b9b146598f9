"""Checkpointing: orbax training state + flax-msgpack per-epoch weights.

Three artifact kinds, mirroring the reference's contract (reference
model/worker.py:376-402, SURVEY.md §5):

1. ``<exp_dir>/state/``       — rolling orbax CheckpointManager with the full
   TrainState (params, optimizer state, jitted PRNG key) + host RNG states +
   {epoch, min_err} metadata. Equivalent of ``state.dict``.
2. ``<exp_dir>/state_set_<name>_best/`` — best-per-test-set snapshot keyed
   on summed test loss (equivalent of ``state_set_<name>_best.dict``).
3. ``<exp_dir>/net_%04d.params`` — per-epoch parameter export (flax msgpack);
   this is the file contract consumed by ``retest`` and the presave tools
   (reference model/worker.py:400-402, data/presave_disp.py:59,82).
"""

from __future__ import annotations

import os
import pickle
import random
from pathlib import Path
from typing import Any

import numpy as np
import jax
import orbax.checkpoint as ocp
from flax import serialization

from .state import TrainState


def net_params_path(exp_dir: Path, epoch: int) -> Path:
    return Path(exp_dir) / f"net_{epoch:04d}.params"


def save_net_params(exp_dir: Path, epoch: int, params: Any) -> Path:
    path = net_params_path(exp_dir, epoch)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_net_params(path: Path, params_template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())


def _host_rng_states() -> bytes:
    return pickle.dumps({
        "numpy": np.random.get_state(),
        "python": random.getstate(),
    })


def _restore_host_rng(blob: bytes) -> None:
    st = pickle.loads(blob)
    np.random.set_state(st["numpy"])
    random.setstate(st["python"])


class StateCheckpointer:
    """Rolling full-state checkpoint at <exp_dir>/<name> (default 'state')."""

    def __init__(self, exp_dir: Path, name: str = "state", max_to_keep: int = 2):
        self.dir = Path(exp_dir) / name
        self.mgr = ocp.CheckpointManager(
            self.dir.absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, epoch: int, state: TrainState, min_err: dict) -> None:
        # PRNG keys are stored as raw key data (uint32) for portability.
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng_data": jax.random.key_data(state.rng),
        }
        meta = {"epoch": epoch,
                "min_err": {k: float(v) for k, v in min_err.items()}}
        self.mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        # The write completes on orbax's background thread; the next save
        # (or flush()/close()) blocks until it lands.  Keeping the epoch
        # loop off this wait overlaps the D2H + disk write with the next
        # train epoch (~15 s/epoch on tunneled hosts).
        # INVARIANT: the D2H copy must stay in THIS blocking phase — the
        # train step donates its state (donate_argnums=(0,), steps.py), so
        # once save() returns the caller immediately feeds `state` into a
        # step that deletes its buffers.  Orbax's default path transfers
        # all arrays to host synchronously inside save(); enabling a
        # memory-limited saver (device_host byte limiter) would move some
        # D2H to the background thread and read donated buffers.
        # host RNG sidecar (numpy/python RNG drive shuffling + augmentation)
        with open(self.dir / f"host_rng_{epoch}.pkl", "wb") as f:
            f.write(_host_rng_states())

    def latest_epoch(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, state_template: TrainState):
        """Returns (state, epoch, min_err) or None if nothing saved."""
        self.mgr.wait_until_finished()     # an async save may be in flight
        step = self.mgr.latest_step()
        if step is None:
            return None
        payload_tpl = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
            "rng_data": jax.random.key_data(state_template.rng),
        }
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(payload_tpl),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        meta = restored["meta"]
        rng = jax.random.wrap_key_data(payload["rng_data"])
        state = TrainState(step=payload["step"], params=payload["params"],
                           opt_state=payload["opt_state"], rng=rng)
        host_rng = self.dir / f"host_rng_{step}.pkl"
        if host_rng.exists():
            with open(host_rng, "rb") as f:
                _restore_host_rng(f.read())
        return state, int(meta["epoch"]), dict(meta["min_err"])

    def flush(self):
        """Block until any in-flight async save has fully landed."""
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
