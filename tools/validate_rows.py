#!/usr/bin/env python
"""Validate _pick_rows' VMEM estimate across geometries ON THE REAL CHIP
(ADVICE r2 #5: the 80 MB / 1.3x heuristic is measured at the flagship
points; anything between could overflow the 100 MB limit and fail to
compile — Net has a rows-cap fallback, this tool maps the boundary).

For each (H, C, E, W, batch) geometry: build one fused block's
pallas_call in a CHILD process with a hard timeout, run it once, report
ok / vmem-fail / wedge-timeout.  Covers the flagship stages at batch
256/384/512 plus the zoo XL widths and the region down-blocks.

    /opt/venv/bin/python tools/validate_rows.py [-o /tmp/rows.jsonl]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

# (label, H, W, C, E, P, batch, down)
GEOMETRIES = [
    ("flag_20_b256", 20, 20, 24, 136, 24, 256, 0),
    ("flag_20_b384", 20, 20, 24, 136, 24, 384, 0),
    ("flag_20_b512", 20, 20, 24, 136, 24, 512, 0),
    ("flag_10_b256", 10, 10, 48, 224, 48, 256, 0),
    ("flag_10_b512", 10, 10, 48, 224, 48, 512, 0),
    ("flag_40_b256", 40, 40, 16, 96, 16, 256, 0),
    ("flag_80_b256", 80, 80, 8, 48, 8, 256, 0),
    ("flag_160_b256", 160, 160, 8, 32, 8, 256, 0),
    ("xl_20_b256", 20, 20, 48, 272, 48, 256, 0),
    ("xl_10_b256", 10, 10, 96, 448, 96, 256, 0),
    ("down_40to20_b256", 40, 40, 16, 96, 24, 256, 1),
    ("down_20to10_b256", 20, 20, 24, 136, 48, 256, 1),
    ("demo_28x20_b256", 28, 20, 24, 136, 24, 256, 0),   # 640x448 geometry
]

CHILD = r"""
import sys, numpy as np
import jax, jax.numpy as jnp
label, H, W, C, E, P, N, down = sys.argv[1], *map(int, sys.argv[2:9])
from ffcnn_tpu.kernels.block_fused import (_cs_block, _cs_down_block,
                                           _pick_rows, _pick_rows_down)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(H, C, W * N).astype(np.float32) * .1,
                jnp.bfloat16)
p9 = (jnp.asarray(rng.randn(E, C), jnp.float32) * .1,
      jnp.ones((E, 1), jnp.float32), jnp.zeros((E, 1), jnp.float32),
      jnp.asarray(rng.randn(3, 3, E), jnp.float32) * .1,
      jnp.ones((E, 1), jnp.float32), jnp.zeros((E, 1), jnp.float32),
      jnp.asarray(rng.randn(P, E), jnp.float32) * .1,
      jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))
acts = (2, 2, 0)
if down:
    r = _pick_rows_down(H // 2, E, W * N)
    y = _cs_down_block(x, p9, acts, W, N)
else:
    r = _pick_rows(H, E, W * N)
    y = _cs_block(x, p9, acts, False, 0, W, N)
jax.block_until_ready(y)
print("ROWS_OK", label, "rows", r, "out", y.shape)
"""


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="/tmp/validate_rows.jsonl")
    ap.add_argument("--timeout", type=float, default=420.0)
    args = ap.parse_args(argv)
    for geo in GEOMETRIES:
        label = geo[0]
        try:
            proc = subprocess.run(
                [PY, "-c", CHILD, label] + [str(v) for v in geo[1:]],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO)
            if "ROWS_OK" in proc.stdout:
                rec = {"geo": label, "ok": True,
                       "detail": proc.stdout.strip().splitlines()[-1]}
            else:
                err = (proc.stderr or "")[-1500:]
                rec = {"geo": label, "ok": False,
                       "vmem": "vmem" in err.lower(), "err": err}
        except subprocess.TimeoutExpired:
            rec = {"geo": label, "ok": False, "err": "timeout (wedge?)"}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
