"""Device mesh + batch sharding for data-parallel training.

The reference trains on a single fixed GPU (reference model/worker.py:131)
with no distributed backend at all (SURVEY.md §2.3).  Here data parallelism
is native: a 1-D ``Mesh(('data',))`` over all local devices; the batch axis
of every Batch leaf is sharded over it, parameters/optimizer state are
replicated, and XLA inserts the gradient all-reduce (psum over ICI)
automatically from the sharding annotations — the scaling-book recipe
(annotate shardings, let the compiler place collectives).

Batch layout note: batches are *track-major*, so the batch axis is axis 1
for per-frame tensors and axis 2 for the (tl, tl, bs, ...) flow tensor.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataset import Batch

DATA_AXIS = "data"


def make_mesh(devices=None, batch_size: Optional[int] = None) -> Optional[Mesh]:
    """1-D data mesh. With ``batch_size``, uses the largest device-count
    prefix that divides it (a sharded axis must divide evenly); returns
    None when only a single device would participate."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n == 1:
            return None
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


# PartitionSpec per Batch field (None fields are skipped).
_BATCH_SPECS = dict(
    im=P(None, DATA_AXIS),
    ambient=P(None, DATA_AXIS),
    disp_gt=P(None, DATA_AXIS),
    R=P(None, DATA_AXIS),
    t=P(None, DATA_AXIS),
    flow=P(None, None, DATA_AXIS),
    grad=P(None, DATA_AXIS),
    primary_disp=P(None, DATA_AXIS),
    pseudo_gt=P(None, DATA_AXIS),
    sgm_disp=P(None, DATA_AXIS),
)


def batch_shardings(mesh: Mesh, batch: Batch) -> Batch:
    """NamedSharding pytree matching ``batch``'s present fields."""
    return Batch(**{
        k: (NamedSharding(mesh, _BATCH_SPECS[k])
            if getattr(batch, k) is not None else None)
        for k in Batch._fields
    })


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_pytree(tree, mesh: Mesh):
    """Replicate a pytree over the mesh, multi-process safe.

    ``jax.device_put(x, replicated(mesh))`` rejects *device-resident*
    arrays when the mesh spans non-addressable devices (multi-host), so
    leaves are staged through host memory first; every process holds the
    same values (deterministic init), which is exactly the replicated
    global array.  PRNG key arrays round-trip through key_data.
    """
    repl = replicated(mesh)
    single = jax.process_count() == 1

    def put(x):
        if x is None:
            return None
        if single:
            return jax.device_put(x, repl)
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = jax.device_put(np.asarray(jax.random.key_data(x)), repl)
            return jax.random.wrap_key_data(data)
        return jax.device_put(np.asarray(x), repl)

    return jax.tree.map(put, tree)


def pad_batch(batch: Batch, multiple: int) -> tuple[Batch, int]:
    """Pad the batch axis up to a multiple by repeating the last sample
    (eval loaders keep ragged tails; a sharded axis must divide the mesh).
    Returns (padded batch, original batch size) — callers slice device
    outputs back to the original size."""
    bs = batch.im.shape[1]
    pad = (-bs) % multiple
    if pad == 0:
        return batch, bs

    def pad_leaf(v, axis):
        if v is None:
            return None
        last = np.take(v, [-1], axis=axis)
        reps = np.repeat(last, pad, axis=axis)
        return np.concatenate([v, reps], axis=axis)

    out = {k: pad_leaf(getattr(batch, k), 2 if k == "flow" else 1)
           for k in Batch._fields}
    return Batch(**out), bs


def put_batch(batch: Batch, mesh: Optional[Mesh]) -> Batch:
    """Host->device transfer with per-leaf shardings.

    With ``mesh=None`` (single device) the transfer is still explicit —
    callers run it on the loader's producer thread so H2D overlaps the
    previous step's compute instead of blocking step dispatch."""
    shardings = batch_shardings(mesh, batch) if mesh is not None else None
    out = {}
    for k in Batch._fields:
        v = getattr(batch, k)
        if v is None:
            out[k] = None
        elif shardings is not None:
            out[k] = jax.device_put(v, getattr(shardings, k))
        else:
            out[k] = jax.device_put(v)
    return Batch(**out)
