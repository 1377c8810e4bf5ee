#!/usr/bin/env python
"""Dump the top device ops NOT attributed to a layer named-scope — the
"(pre/post)" bucket of profile_layers (preprocess, YOLO decode, NMS, layout
glue).  Device time from a jax.profiler trace, same protocol as
profiling.py."""
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

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
ITERS = 10
_SCOPE_RE = re.compile(r"L(\d\d\d)_[a-z]+")


def main():
    net = Net.load(CFG, WEIGHTS, mode=os.environ.get("MODE", "fast"))
    img = bmp_load(os.path.join(REPO, "tests", "fixtures", "test320.bmp"))
    rng = np.random.RandomState(0)
    batch = np.broadcast_to(img, (BATCH,) + img.shape).copy()
    noise = rng.randint(0, 8, batch.shape, dtype=np.uint8)
    batch = np.clip(batch.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    bj = jnp.asarray(batch)
    jax.block_until_ready(net.detect_device(bj))

    tmp = tempfile.mkdtemp(prefix="ffcnn_other_")
    try:
        with jax.profiler.trace(tmp):
            r = None
            for _ in range(ITERS):
                r = net.detect_device(bj)
            jax.block_until_ready(r)
        path = glob.glob(os.path.join(tmp,
                                      "plugins/profile/*/*.trace.json.gz"))[0]
        with gzip.open(path) as f:
            data = json.load(f)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n or n.startswith("/device:")}
    agg = collections.Counter()
    example = {}
    tot_other = tot_all = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        if e["name"].startswith("jit_"):
            continue
        blob = json.dumps(e.get("args") or {}) + e["name"]
        dur = e.get("dur", 0)
        tot_all += dur
        if _SCOPE_RE.search(blob):
            continue
        # strip trailing fusion numbering for aggregation
        key = re.sub(r"[.\d]+$", "", e["name"])
        agg[key] += dur
        tot_other += dur
        if key not in example:
            example[key] = (e.get("args") or {}).get("long_name",
                                                     e["name"])[:160]
    print("total device %.1f us/step; unattributed %.1f us/step"
          % (tot_all / ITERS, tot_other / ITERS))
    for key, dur in agg.most_common(40):
        print("%9.1f us  %-40s %s" % (dur / ITERS, key,
                                      example.get(key, "")[:110]))


if __name__ == "__main__":
    main()
