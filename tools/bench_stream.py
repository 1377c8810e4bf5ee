#!/usr/bin/env python
"""Host-resident-input throughput: serial detect() vs pipelined
detect_stream() (VERDICT r2 #6 — overlap the host->HBM copy and host-side
result decode with device compute).

bench.py's headline reuses ONE device-resident batch, which excludes the
per-batch host->HBM transfer (~78 MB at batch 256) and the result decode a
real frame stream pays.  This harness feeds DISTINCT host (numpy) batches:

  serial  — detect(batch) per batch: copy, compute, fetch, decode, repeat
  stream  — detect_stream(batches, depth): batch i+1's copy + dispatch are
            issued before blocking on batch i, so transfer/decode ride
            under compute

One JSON line with both rates plus the per-image result-set equality check
(the pipelined path must be result-identical, not just fast).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# CPU smoke runs: JAX_PLATFORMS in the env is ignored by the axon plugin
# once set at spawn (CLAUDE.md); the config knob always wins.
if os.environ.get("FFCNN_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["FFCNN_PLATFORM"])

from ffcnn_tpu import Net
from ffcnn_tpu.imageio.bmp import bmp_load

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
BATCH = int(os.environ.get("BATCH", "256"))
N_BATCHES = int(os.environ.get("N_BATCHES", "8"))
DEPTH = int(os.environ.get("DEPTH", "2"))
REPEATS = int(os.environ.get("REPEATS", "3"))


def _dets_equal(a, b):
    return (len(a) == len(b)
            and all(len(x) == len(y) for x, y in zip(a, b))
            and all(g.class_id == w.class_id and abs(g.score - w.score) < 1e-6
                    and max(abs(p - q) for p, q in
                            zip((g.x1, g.y1, g.x2, g.y2),
                                (w.x1, w.y1, w.x2, w.y2))) < 1e-3
                    for x, y in zip(a, b) for g, w in zip(x, y)))


def main():
    if not (os.environ.get("XLA_FLAGS")
            or os.environ.get("LIBTPU_INIT_ARGS")):
        from ffcnn_tpu import enable_compile_cache
        enable_compile_cache()
    net = Net.load(CFG, WEIGHTS, mode=os.environ.get("MODE", "fast"))
    img = bmp_load(os.path.join(REPO, "tests", "fixtures", "test320.bmp"))
    from bench import noisy_batches       # the shared workload recipe
    batches = noisy_batches(img, BATCH, N_BATCHES)
    total = BATCH * N_BATCHES

    # Warm the pipeline (compile) before timing either path.
    net.detect(batches[0])

    serial_dt = float("inf")
    serial_out = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = [net.detect(b) for b in batches]
        serial_dt = min(serial_dt, time.perf_counter() - t0)
        serial_out = out

    stream_dt = float("inf")
    stream_out = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = list(net.detect_stream(batches, depth=DEPTH))
        stream_dt = min(stream_dt, time.perf_counter() - t0)
        stream_out = out

    same = all(_dets_equal(s, p) for s, p in zip(serial_out, stream_out))

    # Trace-derived device occupancy (VERDICT r3 #5): busy/span from
    # device-side timestamps, so the tunnel's RTT appears as idle instead
    # of poisoning the number.  One traced pass per path.
    occ = {}
    try:
        import shutil
        import tempfile

        import jax

        from ffcnn_tpu.profiling import trace_occupancy
        for label, run in (
                ("serial", lambda: [net.detect(b) for b in batches]),
                ("stream", lambda: list(net.detect_stream(batches,
                                                          depth=DEPTH)))):
            tmp = tempfile.mkdtemp(prefix="stream_occ_")
            try:
                with jax.profiler.trace(tmp):
                    run()
                occ[label] = trace_occupancy(tmp)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    except Exception as ex:                     # occupancy is best-effort
        occ = {"error": f"{type(ex).__name__}: {ex}"}

    print(json.dumps({
        "batch": BATCH, "n_batches": N_BATCHES, "depth": DEPTH,
        "serial_img_s": round(total / serial_dt, 1),
        "stream_img_s": round(total / stream_dt, 1),
        "speedup": round(serial_dt / stream_dt, 3),
        "results_identical": bool(same),
        "occupancy": occ,
        "mode": os.environ.get("MODE", "fast"),
    }))


if __name__ == "__main__":
    main()
