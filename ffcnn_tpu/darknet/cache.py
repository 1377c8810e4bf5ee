"""Folded-parameter cache.

The ``.weights`` file *is* the checkpoint format (reference readme spec;
ffcnn.c:107-112) and stays the canonical ingest.  Loading folds BatchNorm
(ffcnn.c:229-232) and repacks weights to HWIO; for large models or fleets of
workers that work can be cached: this module stores the folded params as an
``.npz`` keyed by a content hash of the cfg+weights pair, so a reload is one
mmap-friendly read with no parsing or folding.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Dict, Tuple

import numpy as np

from .ir import NetIR
from .weights import FoldedConvParams

_VERSION = 1


def cache_key(cfg_path: str, weights_path: str) -> str:
    """Content hash of the cfg+weights pair.  Folded params are independent
    of the input dimensions, so input size is deliberately NOT in the key —
    one entry serves every detect() size bucket."""
    h = hashlib.sha256()
    for p in (cfg_path, weights_path):
        with open(p, "rb") as f:
            h.update(f.read())
    h.update(f"v{_VERSION}".encode())
    return h.hexdigest()[:24]


def save_params(path: str, params: Dict[int, FoldedConvParams]) -> None:
    arrays = {}
    for li, p in params.items():
        arrays[f"w{li}"] = p.weights
        arrays[f"s{li}"] = p.scale
        arrays[f"b{li}"] = p.bias
    # unique temp per writer: concurrent workers sharing a cache_dir must
    # not clobber each other's in-flight file before the atomic publish
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=os.path.basename(path) + ".")
    try:
        with os.fdopen(fd, "wb") as f:  # file object: no .npz suffix games
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_params(path: str) -> Dict[int, FoldedConvParams]:
    data = np.load(path)
    out: Dict[int, FoldedConvParams] = {}
    for name in data.files:
        if not name.startswith("w"):
            continue
        li = int(name[1:])
        out[li] = FoldedConvParams(weights=data[f"w{li}"],
                                   scale=data[f"s{li}"],
                                   bias=data[f"b{li}"])
    return out


def load_or_build(ir: NetIR, cfg_path: str, weights_path: str,
                  cache_dir: str,
                  ) -> Tuple[Dict[int, FoldedConvParams], bool]:
    """Return (params, was_cached).  Builds and populates the cache on miss."""
    from .weights import load_weights

    os.makedirs(cache_dir, exist_ok=True)
    key = cache_key(cfg_path, weights_path)
    path = os.path.join(cache_dir, f"ffcnn-params-{key}.npz")
    if os.path.exists(path):
        try:
            return load_params(path), True
        except Exception:
            try:                             # corrupt cache entry: rebuild.
                os.unlink(path)              # A concurrent worker may have
            except OSError:                  # already replaced/removed it —
                pass                         # still fall through to rebuild.
    params, _ = load_weights(ir, weights_path)
    save_params(path, params)
    return params, False
