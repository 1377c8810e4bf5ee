"""Device-mesh helpers.

The reference has no multi-device anything (SURVEY.md §2: its only
concurrency is one OpenMP pragma, conv-v4.c:53).  The TPU-native scaling
story is a ``jax.sharding.Mesh`` over ICI with named axes:

  * ``data``    — batch sharding (the meaningful axis for inference: each
    chip runs independent images; no cross-chip collectives in the hot path)
  * ``spatial`` — optional image-row sharding (the CNN analog of sequence/
    context parallelism): activations are split along H and the SPMD
    partitioner inserts halo exchanges at every conv/pool window.  The
    regime where this wins is few huge images (latency-bound, batch <
    chips) — the reference's ALIGN-32 arbitrary-size inputs (ffcnn.c:133)
    taken to sizes one chip handles poorly.
  * ``model``   — optional channel/tensor parallelism for models whose
    filter counts warrant it; XLA inserts the all-gathers/psums where
    layers consume full channels.

Meshes are plain constructs over ``jax.devices()`` so the same code runs on
one chip, a pod slice, or the CPU-simulated 8-device test mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(devices: Optional[Sequence] = None, *, model_parallel: int = 1,
              spatial_parallel: int = 1, pipeline_parallel: int = 1) -> Mesh:
    """Build a (data, spatial, model[, pipe]) mesh over the given (or all)
    devices.  Axes of size 1 are free — the same pipeline code runs on any
    shape.  ``pipeline_parallel`` > 1 appends a minor ``pipe`` axis (minor =
    consecutive stages land on adjacent devices, so the per-tick ppermute
    boundary hop in parallel/pp.py rides neighbor ICI links); the 3-axis
    name tuple is kept unchanged otherwise for existing meshes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    per = model_parallel * spatial_parallel * pipeline_parallel
    if n % per != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel} "
            f"* spatial_parallel={spatial_parallel} "
            f"* pipeline_parallel={pipeline_parallel}")
    if pipeline_parallel > 1:
        arr = np.array(devices).reshape(n // per, spatial_parallel,
                                        model_parallel, pipeline_parallel)
        return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS, PIPE_AXIS))
    arr = np.array(devices).reshape(n // per, spatial_parallel,
                                    model_parallel)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def activation_sharding(mesh: Mesh) -> NamedSharding:
    """(N, H, W, C) activations: batch over ``data``, rows over ``spatial``
    (a no-op when the mesh has no/size-1 spatial axis)."""
    if SPATIAL_AXIS in mesh.shape and mesh.shape[SPATIAL_AXIS] > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
