"""Reliable kernel timing on the tunneled TPU: device time from profiler
traces (host wall-clock through the axon tunnel is noisy and misleading).

Usage:
    from tools.devtime import device_ms
    ms = device_ms(fn, *args, iters=10)   # mean device ms per call
"""
import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax


def device_ms(fn, *args, iters: int = 10):
    """Mean device-side ms per invocation of fn(*args), from a trace."""
    r = fn(*args)
    jax.block_until_ready(r)
    tmp = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
        path = glob.glob(os.path.join(tmp, "plugins/profile/*/*.trace.json.gz"))
        if not path:
            raise RuntimeError("no trace produced")
        with gzip.open(path[0]) as f:
            data = json.load(f)
        ev = data["traceEvents"]
        pids = {e["pid"]: e["args"].get("name", "") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev = {p for p, n in pids.items() if "TPU" in n}
        total = 0.0
        for e in ev:
            if (e.get("ph") == "X" and e.get("pid") in dev
                    and not e["name"].startswith("jit_")):
                total += e.get("dur", 0)
        return total / iters / 1000.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
