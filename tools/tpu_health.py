#!/usr/bin/env python
"""Probe the tunneled TPU's health in escalating stages.

The axon tunnel has two distinct failure modes (CLAUDE.md):
  * wedge  — a bad fusion livelocks the chip; EVERY later program hangs
             until the tunnel resets (~5-15 min idle)
  * hang   — ONE full-net run blocks indefinitely (process idles right
             after backend init) while tiny probes still pass

So a single ping can't tell you the machine is usable.  This tool runs
three stages, each in its own subprocess with a hard timeout, and prints
one status line per stage:

  1. tiny   — 8x128 elementwise jit (seconds)
  2. medium — one 256-channel conv, chained (compile + real dispatch)
  3. cached — the flagship parity pipeline at 320x320 (exercises the
              compile cache + a full-net dispatch)

Usage: python tools/tpu_health.py [--wait N]   (retry every 60 s up to N
minutes until all stages pass — useful before a benchmarking session).
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = {
    "tiny": ("""
import jax, jax.numpy as jnp
print(float(jax.jit(lambda v: (v*2).sum())(jnp.ones((8,128)))))
""", 90),
    "medium": ("""
import jax, jax.numpy as jnp, numpy as np
from jax import lax
x = jnp.asarray(np.random.RandomState(0).randn(8, 64, 64, 256), jnp.bfloat16)
w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 256, 256), jnp.bfloat16)
def step(i, v):
    return lax.conv_general_dilated(v, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * 1e-3
r = jax.jit(lambda v: lax.fori_loop(0, 4, step, v))(x)
jax.block_until_ready(r); print("ok")
""", 240),
    "cached": ("""
import sys; sys.path.insert(0, %r)
from ffcnn_tpu import Net, enable_compile_cache
from ffcnn_tpu.imageio.bmp import bmp_load
import os
enable_compile_cache()
net = Net.load("/root/reference/yolo-fastest-1.1.cfg",
               "/root/reference/yolo-fastest-1.1.weights", mode="parity")
dets = net.detect(bmp_load(os.path.join(%r, "tests/fixtures/test320.bmp")))
print("detections:", len(dets))
""" % (REPO, REPO), 420),
}


def run_stage(name: str) -> bool:
    code, timeout = STAGES[name]
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=timeout)
        ok = out.returncode == 0
        tail = (out.stdout or out.stderr).decode().strip().splitlines()
        msg = tail[-1] if tail else ""
    except subprocess.TimeoutExpired:
        ok, msg = False, f"TIMEOUT after {timeout}s"
    print(f"  {name:7s} {'PASS' if ok else 'FAIL'}  "
          f"{time.time() - t0:6.1f}s  {msg}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", type=int, default=0, metavar="MIN",
                    help="retry every 60 s for up to MIN minutes")
    args = ap.parse_args()
    deadline = time.time() + args.wait * 60
    while True:
        print("tpu_health @", time.strftime("%H:%M:%S"))
        if all(run_stage(s) for s in STAGES):
            print("HEALTHY")
            return 0
        if time.time() >= deadline:
            print("UNHEALTHY" + (" (gave up waiting)" if args.wait else ""))
            return 1
        time.sleep(60)


if __name__ == "__main__":
    raise SystemExit(main())
