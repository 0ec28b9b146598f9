"""Multi-host (DCN) data parallelism.

The reference is strictly single-GPU (reference model/worker.py:131); the
distributed story is ours to design (SURVEY.md §2.3).  The single-host
recipe in :mod:`.mesh` — 1-D ``Mesh(('data',))``, batch sharded on the
``data`` axis, params replicated, XLA-inserted psum over ICI — extends to
multi-host unchanged *except* for array construction: with multiple
processes each host only holds its own slice of the global batch, so device
arrays are assembled with ``jax.make_array_from_process_local_data`` instead
of ``jax.device_put``.

Collective layout: the mesh orders all devices with the process (host) axis
outermost (``jax.devices()`` order), so the gradient all-reduce decomposes
into an ICI reduce-scatter/all-gather within each host and a single DCN
all-reduce of one replica-shard per host — the standard DP-over-DCN
pattern; no code here needs to schedule that, XLA's GSPMD partitioner does
it from the shardings.

Usage (same program on every host)::

    from depthinspace_tpu.parallel import multihost as mh
    mh.init_multihost()                    # no-op when single-process
    mesh = make_mesh(batch_size=global_bs)
    lo, hi = mh.process_batch_bounds(global_bs)
    local = loader.load(samples[lo:hi])    # each host loads its own slice
    batch = mh.put_batch_global(local, mesh, global_bs)
    state, comps = train_step(state, batch, epoch)   # unchanged

Checkpointing: only process 0 writes (``is_primary()``); orbax handles
replicated state natively.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..data.dataset import Batch
from .mesh import Mesh, batch_shardings


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime for a multi-host mesh.

    Call before any other JAX API on every host.  With no arguments the
    values come from the cluster environment (TPU pod metadata, or the
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    variables); a bare single-process run (none of those present) is a
    no-op so the same entry point works everywhere.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single process, nothing to coordinate
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics/logs."""
    return jax.process_index() == 0


def process_batch_bounds(global_batch_size: int) -> tuple[int, int]:
    """[lo, hi) slice of the global batch axis this process is responsible
    for loading.  The batch must divide evenly over processes (pad eval
    tails with :func:`..mesh.pad_batch` first)."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} does not divide over {n} hosts")
    per = global_batch_size // n
    lo = jax.process_index() * per
    return lo, lo + per


def put_batch_global(local_batch: Batch, mesh: Mesh,
                     global_batch_size: Optional[int] = None) -> Batch:
    """Assemble a globally-sharded Batch from per-process local slices.

    ``local_batch`` holds this process's ``global_batch_size /
    process_count`` samples on the batch axis (track-major layout: axis 1,
    axis 2 for flow).  Single-process this is exactly ``put_batch``.
    Returns a Batch of global jax.Arrays sharded over ``mesh``.
    """
    shardings = batch_shardings(mesh, local_batch)
    nproc = jax.process_count()

    def assemble(v, sharding, batch_axis):
        if v is None:
            return None
        v = np.asarray(v)
        if nproc == 1:
            return jax.device_put(v, sharding)
        global_shape = list(v.shape)
        global_shape[batch_axis] *= nproc
        return jax.make_array_from_process_local_data(
            sharding, v, tuple(global_shape))

    out = {}
    for k in Batch._fields:
        axis = 2 if k == "flow" else 1
        out[k] = assemble(getattr(local_batch, k), getattr(shardings, k), axis)
    if global_batch_size is not None and out["im"] is not None:
        assert out["im"].shape[1] == global_batch_size, (
            out["im"].shape, global_batch_size)
    return Batch(**out)
