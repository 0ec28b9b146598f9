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


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


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


def put_batch(batch: Batch, mesh: Optional[Mesh]) -> Batch:
    """Host->device transfer with per-leaf shardings (single fused call)."""
    if mesh is None:
        return batch
    shardings = batch_shardings(mesh, batch)
    leaves = {k: getattr(batch, k) for k in Batch._fields}
    out = {}
    for k, v in leaves.items():
        if v is None:
            out[k] = None
        else:
            out[k] = jax.device_put(v, getattr(shardings, k))
    return Batch(**out)
