#!/usr/bin/env python
"""Measure fast-mode throughput at batch 256 under the current XLA_FLAGS
(set by the caller) and sanity-check the golden detections.  One JSON line.

Usage:  XLA_FLAGS="--xla_tpu_foo=true" /opt/venv/bin/python tools/bench_flags.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ffcnn_tpu import Net
from ffcnn_tpu.imageio.bmp import bmp_load

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
BATCH = int(os.environ.get("BATCH", "256"))
ITERS = 30


def main():
    # Persistent compile cache: distinct FFCNN_* trace-time flag configs
    # hash to distinct HLO (so A/Bs never collide), and re-running a
    # config after a tunnel hang reloads instead of recompiling.  NOT safe
    # under XLA_FLAGS/LIBTPU_INIT_ARGS sweeps — compiler flags are not all
    # part of the jax cache key, so a cached executable from a different
    # flag set could be silently reused; skip the cache there.
    if not (os.environ.get("XLA_FLAGS")
            or os.environ.get("LIBTPU_INIT_ARGS")):
        from ffcnn_tpu import enable_compile_cache
        enable_compile_cache()
    mode = os.environ.get("MODE", "fast")
    net = Net.load(CFG, WEIGHTS, mode=mode)
    img = bmp_load(os.path.join(REPO, "tests", "fixtures", "test320.bmp"))
    # int8 needs activation scales before it can pass any golden gate, and
    # its tolerance is the bench.py int8-gate one (12px), not fast's 2px —
    # without this every device int8 row read golden_ok:false and
    # apply_tuning discarded the whole A/B (r4 queue stage 2).
    tol = 2
    if mode == "int8":
        net.calibrate(img[None])
        tol = 12

    # golden sanity (classes exact, boxes within mode tolerance)
    golden = [(0, (90, 66, 135, 292)), (18, (215, 111, 306, 248)),
              (16, (35, 196, 106, 268))]
    dets = net.detect(img)
    ok = len(dets) == len(golden) and all(
        d.class_id == cat and all(abs(g - v) <= tol for g, v in
                                  zip(rect, (d.x1, d.y1, d.x2, d.y2)))
        for d, (cat, rect) in zip(dets, golden))

    rng = np.random.RandomState(0)
    batch = np.broadcast_to(img, (BATCH,) + img.shape).copy()
    batch = np.clip(batch.astype(np.int16)
                    + rng.randint(0, 8, batch.shape, dtype=np.uint8),
                    0, 255).astype(np.uint8)
    batch[0] = img          # image 0 exact -> golden-gates the BATCHED
    #                         pipeline too (batch%128 activates the fused
    #                         kernels, which the single-image probe skips)
    bj = jnp.asarray(batch)
    res = net.detect_device(bj)
    jax.block_until_ready(res)
    dets0 = [d for d in net._to_detections(res)[0]]
    ok_batch = len(dets0) == len(golden) and all(
        d.class_id == cat and all(abs(g - v) <= tol for g, v in
                                  zip(rect, (d.x1, d.y1, d.x2, d.y2)))
        for d, (cat, rect) in zip(dets0, golden))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = net.detect_device(bj)
        jax.block_until_ready(r)
        dt = min(dt, (time.perf_counter() - t0) / ITERS)
    print(json.dumps({"img_s": round(BATCH / dt, 1),
                      "ms_batch": round(dt * 1000, 3),
                      "golden_ok": bool(ok),
                      "golden_batch_ok": bool(ok_batch),
                      "flags": os.environ.get("XLA_FLAGS", ""),
                      # knob provenance for tools/apply_tuning.py (callers
                      # like bench_regions overwrite with their overrides)
                      "env": {k: v for k, v in sorted(os.environ.items())
                              if k.startswith("FFCNN_")
                              and k != "FFCNN_TUNED_DEFAULTS"}}))


if __name__ == "__main__":
    main()
