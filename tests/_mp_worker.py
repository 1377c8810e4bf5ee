"""Worker for tests/test_multiprocess.py: one process of a 2-process global
CPU mesh.  argv: <coordinator_port> <process_id> <num_processes>.

Each process contributes 2 local images to a global batch of 4 sharded over
the 4-device global mesh, runs the dp.py sharded pipeline, and checks its
OWN images' results against a local single-process parity Net — i.e. the
multi-process path must be invisible to numerics."""

import os
import sys

PORT, PID, NPROC = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ffcnn_tpu import Net  # noqa: E402
from ffcnn_tpu.darknet import parse_cfg  # noqa: E402
from ffcnn_tpu.darknet.weights import (load_weights,  # noqa: E402
                                       synth_weights_bytes)
from ffcnn_tpu.graph.build import params_to_pytree  # noqa: E402
from ffcnn_tpu.parallel import build_sharded_pipeline, make_mesh  # noqa: E402
from ffcnn_tpu.parallel.multiprocess import (global_batch,  # noqa: E402
                                             init_distributed, local_results,
                                             shutdown_distributed)

LOCAL_N = 2

info = init_distributed(f"127.0.0.1:{PORT}", NPROC, PID)
assert info.process_count == NPROC, info
assert info.global_devices == NPROC * 2, info

ir = parse_cfg(os.path.join(REPO, "models", "ffcnn-micro.cfg"), 64, 64)
params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7, obj_bias=0.0))

mesh = make_mesh()                                  # global 4-device mesh
fn, place = build_sharded_pipeline(ir, mesh, 64, 64, dtype=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST,
                                   topk=512)

rng = np.random.RandomState(100 + PID)              # distinct per process
local = rng.randint(0, 256, (LOCAL_N, 64, 64, 3), dtype=np.uint8)
batch = global_batch(mesh, local)
assert batch.shape[0] == NPROC * LOCAL_N

res = fn(place(params_to_pytree(params)), batch,
         jnp.zeros(3, jnp.float32), jnp.full(3, 1 / 255.0, jnp.float32))
jax.block_until_ready(res)
start, mine = local_results(res)
assert start == PID * LOCAL_N, (start, PID)

net = Net(ir, params, mode="parity", topk=512)       # local ground truth
want = net.detect(local)
for i in range(LOCAL_N):
    dets = want[i]
    assert int(mine.count[i]) == len(dets), (i, int(mine.count[i]), len(dets))
    got_scores = [s for s in mine.scores[i] if s > 0]
    for g, w in zip(sorted(got_scores, reverse=True),
                    sorted((d.score for d in dets), reverse=True)):
        assert abs(g - w) < 1e-5, (g, w)

shutdown_distributed()
print(f"MP-OK {PID}", flush=True)
