"""Reliable kernel timing on the tunneled TPU: device time from profiler
traces (host wall-clock through the axon tunnel is noisy and misleading).

Usage:
    from tools.devtime import device_ms
    ms = device_ms(fn, *args, iters=10)   # mean device ms per call

Thin wrapper over the package's trace parser (ffcnn_tpu.profiling)."""
import os
import shutil
import sys
import tempfile

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffcnn_tpu.profiling import _parse_trace  # noqa: E402


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
        per_layer, other = _parse_trace(tmp, iters)
        return (sum(per_layer.values()) + other) / 1000.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
