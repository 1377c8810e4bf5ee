"""Batch image loader feeding the device pipeline.

The reference processes one image per iteration of a serial loop
(main, ffcnn.c:577-580); the TPU pipeline wants whole uint8 batches.  This
loader assembles an (N, H, W, 3) BGR batch from a list of BMP paths — via
the native pthread fan-out decoder (native/bmp_codec.c) when built, else a
Python thread pool over the numpy codec — overlapping file IO + decode
across cores so host-side image prep keeps up with device throughput.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Sequence

import numpy as np

from .bmp import bmp_load

try:
    from .. import _ffcnn_native as _native
except ImportError:
    _native = None


def load_batch(paths: Sequence[str], threads: int = 0) -> np.ndarray:
    """Load same-sized 24-bit BMPs into one (N, H, W, 3) uint8 BGR array."""
    paths = list(paths)
    if not paths:
        raise ValueError("empty path list")
    if _native is not None:
        ba, n, h, w = _native.load_batch(paths, threads)
        return np.frombuffer(ba, np.uint8).reshape(n, h, w, 3)
    threads = threads or min(32, os.cpu_count() or 1)
    with concurrent.futures.ThreadPoolExecutor(threads) as ex:
        imgs = list(ex.map(bmp_load, paths))
    first = imgs[0].shape
    for p, im in zip(paths, imgs):
        if im.shape != first:
            raise IOError(f"batch load failed at {p!r} "
                          f"(dims must match {first[1]}x{first[0]})")
    return np.stack(imgs)
