"""Multi-process mesh: 2 processes x 2 virtual CPU devices over a loopback
coordinator (jax.distributed.initialize), running the dp.py sharded pipeline
on a GLOBAL 4-device mesh — the locally-testable slice of the multi-host
story (SURVEY.md §5 'distributed communication backend').  Cross-process
collectives ride Gloo on CPU; on TPU pods the same code rides ICI/DCN."""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)              # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"MP-OK {pid}" in out, out[-2000:]
