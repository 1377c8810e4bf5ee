#!/usr/bin/env python
"""Latency-regime characterization: batch 1/8/32/64 ladder (VERDICT r4 #6).

The reference is a batch-1 latency engine (67.5 ms/img published,
readme.txt:114); this repo's headline is a batch-256 throughput number.
This tool fills the regime in between: for each batch size it reports

  * wall p50 of dispatch-to-sync (includes the ~30 ms axon tunnel RTT —
    an environment artifact, reported for completeness);
  * device time per step from a profiler trace (the honest on-chip
    latency; tunnel RTT shows up as idle, not device time);
  * img/s at that batch (device-time based).

Feeds the DEPLOY.md "latency-bound serving" recipe: which batch to run
when the SLA is per-frame latency rather than throughput.

    /opt/venv/bin/python tools/latency_ladder.py [--mode fast]
"""
import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE = "/root/reference"
CFG = os.path.join(REFERENCE, "yolo-fastest-1.1.cfg")
WEIGHTS = os.path.join(REFERENCE, "yolo-fastest-1.1.weights")
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def device_ms_per_step(net, img, iters=20):
    """Device time per dispatch from a profiler trace — delegates the
    shard-merge + device-pid parsing to ffcnn_tpu.profiling (one shared
    implementation; r5 review)."""
    import jax

    from ffcnn_tpu.profiling import device_op_time_ms
    tmp = tempfile.mkdtemp(prefix="lat_ladder_")
    with jax.profiler.trace(tmp):
        for _ in range(iters):
            r = net.detect_device(img)
        jax.block_until_ready(r)
    return device_op_time_ms(tmp, iters)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mode", default="fast",
                    choices=("fast", "parity", "int8"))
    ap.add_argument("--batches", nargs="*", type=int,
                    default=[1, 8, 32, 64])
    ap.add_argument("--wall-iters", type=int, default=50)
    ap.add_argument("-o", "--out", default=None,
                    help="append one JSON line per batch (resume-friendly)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from ffcnn_tpu import Net, enable_compile_cache
    from ffcnn_tpu.imageio.bmp import bmp_load
    enable_compile_cache()

    net = Net.load(CFG, WEIGHTS, mode=args.mode)
    base = bmp_load(os.path.join(FIXTURES, "test320.bmp"))
    if args.mode == "int8":
        net.calibrate(base[None])
    rows = []
    for b in args.batches:
        rng = np.random.RandomState(b)
        noise = rng.randint(0, 8, (b,) + base.shape, dtype=np.uint8)
        img = np.clip(np.broadcast_to(base, (b,) + base.shape)
                      .astype(np.int16) + noise, 0, 255).astype(np.uint8)
        import jax.numpy as jnp
        bj = jnp.asarray(img)
        jax.block_until_ready(net.detect_device(bj))     # compile
        walls = []
        for _ in range(args.wall_iters):
            t0 = time.perf_counter()
            jax.block_until_ready(net.detect_device(bj))
            walls.append((time.perf_counter() - t0) * 1000)
        walls.sort()
        p50 = walls[len(walls) // 2]
        dev_ms = device_ms_per_step(net, bj)
        row = {"batch": b, "mode": args.mode,
               "wall_p50_ms": round(p50, 3),
               "device_ms_per_step": round(dev_ms, 3),
               "device_ms_per_img": round(dev_ms / b, 4),
               "device_img_s": round(b / dev_ms * 1000, 1)}
        rows.append(row)
        print(f"batch {b:3d}: wall p50 {p50:7.2f} ms  device "
              f"{dev_ms:7.2f} ms/step = {dev_ms / b:6.3f} ms/img  "
              f"({b / dev_ms * 1000:8.0f} img/s)", flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    print(json.dumps({"mode": args.mode,
                      "device": str(jax.devices()[0].device_kind),
                      "ladder": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
