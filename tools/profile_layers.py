#!/usr/bin/env python
"""Per-layer device-time profile of the fused pipeline.

Captures a jax.profiler trace of N dispatches, parses the perfetto JSON, and
joins device op durations (grouped by the L###_<type> named_scope emitted by
graph/build.py) with the IR layer table — the TPU analog of the reference's
net_profile() (ffcnn.c:550), but per-layer instead of per-layer-type.

Usage: python tools/profile_layers.py [batch] [size]
"""
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
TRACE = "/tmp/ffcnn_layer_trace"
ITERS = 10


def capture(batch_n, size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="fast", input_w=size, input_h=size)
    img = bmp_load("/root/repo/tests/fixtures/test320.bmp")
    if img.shape[0] != size:
        idx = (np.arange(size) * img.shape[0]) // size
        img = img[idx][:, (np.arange(size) * img.shape[1]) // size]
    batch = jnp.asarray(np.broadcast_to(img, (batch_n,) + img.shape).copy())
    r = net.detect_device(batch)
    jax.block_until_ready(r)
    shutil.rmtree(TRACE, ignore_errors=True)
    with jax.profiler.trace(TRACE):
        for _ in range(ITERS):
            r = net.detect_device(batch)
        jax.block_until_ready(r)
    return net.ir


def parse(ir, batch_n):
    path = glob.glob(os.path.join(TRACE, "plugins/profile/*/*.trace.json.gz"))[0]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            if e["name"].startswith("jit_"):
                continue                      # parent span, double counts
            m = re.search(r"L(\d\d\d)_[a-z]+", json.dumps(e.get("args") or {})
                          + e["name"])
            agg[int(m.group(1)) if m else -1] += e.get("dur", 0)

    from ffcnn_tpu.darknet.ir import LayerType
    rows = []
    for li, layer in enumerate(ir.layers):
        us = agg.get(li, 0) / ITERS
        ib, ob = ir.blobs[li], ir.blobs[li + 1]
        if layer.type == LayerType.CONV:
            kind = ("dw%dx%d" % (layer.fs, layer.fs)
                    if layer.groups > 1 else
                    ("pw1x1" if layer.fs == 1 else "conv%d" % layer.fs))
            desc = "%s s%d  %3dx%3dx%3d->%3dx%3dx%3d" % (
                kind, layer.stride, ib.w, ib.h, ib.c, ob.w, ob.h, ob.c)
        else:
            kind = layer.type.name.lower()
            desc = "%-26s ->%3dx%3dx%3d" % (kind, ob.w, ob.h, ob.c)
        rows.append((li, kind, desc, us))

    print("%4s %-10s %-42s %9s" % ("idx", "kind", "shape", "us/step"))
    for li, kind, desc, us in rows:
        if us > 0:
            print("%4d %-10s %-42s %9.1f" % (li, kind, desc, us))
    other = agg.get(-1, 0) / ITERS
    total = sum(us for *_, us in rows) + other
    print("\nby kind:")
    by_kind = collections.Counter()
    for _, kind, _, us in rows:
        by_kind[kind] += us
    by_kind["(decode/nms/pre)"] = other
    for kind, us in by_kind.most_common():
        print("  %-18s %9.1f us  %5.1f%%" % (kind, us, 100 * us / total))
    print("total device: %.0f us/step  (batch %d -> %.0f img/s)"
          % (total, batch_n, batch_n / total * 1e6))


if __name__ == "__main__":
    bn = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    ir = capture(bn, size)
    parse(ir, bn)
