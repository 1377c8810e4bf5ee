"""Device-mesh helpers.

The reference has no multi-device anything (SURVEY.md §2: its only
concurrency is one OpenMP pragma, conv-v4.c:53).  The TPU-native scaling
story is a ``jax.sharding.Mesh`` over ICI with named axes:

  * ``data``  — batch sharding (the meaningful axis for inference: each chip
    runs independent images; no cross-chip collectives in the hot path)
  * ``model`` — optional channel/tensor parallelism for models whose filter
    counts warrant it; XLA inserts the all-gathers/psums where layers
    consume full channels.

Meshes are plain constructs over ``jax.devices()`` so the same code runs on
one chip, a pod slice, or the CPU-simulated 8-device test mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, *, model_parallel: int = 1
              ) -> Mesh:
    """Build a (data, model) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
