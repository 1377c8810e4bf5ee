"""Multi-process / multi-host execution (the DCN story, SURVEY.md §5).

The reference is strictly single-process — zero IPC anywhere (SURVEY.md §2).
Scaling past one host is idiomatic JAX, not sockets: every process calls
``jax.distributed.initialize`` against a shared coordinator, after which
``jax.devices()`` is the GLOBAL device set and the existing mesh/pjit
pipeline (parallel/dp.py) runs unchanged over a global mesh.  XLA routes
collectives over ICI within a slice and over DCN (TPU) or Gloo (CPU test
meshes) across processes.

Two deployment recipes:

* **One process per chip (serving).**  No cross-process communication at
  all: run N independent ``python -m ffcnn_tpu.serve --port 860X`` processes,
  each pinned to one chip (``JAX_VISIBLE_DEVICES=X`` / platform equivalent),
  behind any HTTP load balancer.  This module is NOT needed for that — it is
  the recommended topology for inference, since detection needs no
  cross-chip collectives (VERDICT r1 §parallelism).

* **One process per host, global DP (batch throughput).**  Each process:

      info = init_distributed(coordinator, num_processes, process_id)
      mesh = make_mesh()                       # over GLOBAL devices
      fn, place = build_sharded_pipeline(ir, mesh, h, w)
      batch = global_batch(mesh, local_images) # local shard -> global array
      res = fn(place(params), batch, mean, norm)

  ``tests/test_multiprocess.py`` runs exactly this, 2 processes x 2 CPU
  devices over a loopback coordinator.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ProcInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> ProcInfo:
    """Connect this process to the global JAX runtime.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``), so launchers can configure
    workers purely through the environment.  On TPU pods with the cloud
    metadata service, all three may be None and JAX autodetects.  Idempotent:
    a second call is a no-op returning the current topology.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if not _is_initialized():
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return ProcInfo(process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    local_devices=jax.local_device_count(),
                    global_devices=jax.device_count())


def _is_initialized() -> bool:
    from jax._src import distributed  # no public is-initialized API yet
    return distributed.global_state.client is not None


def shutdown_distributed() -> None:
    import jax
    if _is_initialized():
        jax.distributed.shutdown()


def global_batch(mesh, local_images: np.ndarray):
    """Assemble the global batch-sharded array from this process's local
    images.  Every process contributes its own ``local_images`` (equal
    counts); the result is one global (N_global, H, W, C) array sharded over
    the mesh ``data`` axis, ready for the dp.py pipeline."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(sharding, local_images)


def local_results(res):
    """Per-process view of a batch-sharded NMSResult: returns (first_global
    index, host numpy arrays of this process's rows) for each field."""
    import jax

    def gather(arr):
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
        start = shards[0].index[0].start or 0
        return start, np.concatenate([np.asarray(s.data) for s in shards])

    start, boxes = gather(res.boxes)
    _, scores = gather(res.scores)
    _, classes = gather(res.classes)
    _, count = gather(res.count)
    return start, type(res)(boxes=boxes, scores=scores, classes=classes,
                            count=count, saturated=gather(res.saturated)[1])
