"""Train state pytree: params + optimizer state + step counter + PRNG key.

The reference couples all of this to torch module/optimizer objects and
checkpoints {epoch, state_dict, optimizer, cpu/gpu RNG} (reference
model/worker.py:379-389); here the whole training state is one pytree that
moves through the jitted train step and serializes via orbax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation,
               rng: jax.Array) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=optimizer.init(params), rng=rng)
