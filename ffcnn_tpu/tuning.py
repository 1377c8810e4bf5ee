"""Measured-on-hardware tuned defaults for the perf knobs.

The fused-kernel configuration space (region spans, boundary storage,
cascade depth, the Pallas stem, int8 channel gates) is explored by an
on-chip A/B harness (tools/bench_regions.py); the winning configuration
is persisted by tools/apply_tuning.py as ``ffcnn_tpu/tuned_defaults.json``
and picked up here — the autotuner-cache analog of the reference's PGO
build modes (build.sh:35-41: measure, then bake the winner into the
binary).

Precedence per flag: explicit environment variable > tuned-defaults file
> the hardcoded code default.  So an operator (or an A/B harness) setting
``FFCNN_FUSED_DOWN=0`` always wins over a tuned ``1``.

``FFCNN_TUNED_DEFAULTS`` points at an alternate file; the empty string
disables the file entirely (tests/conftest.py pins this so unit tests are
hermetic w.r.t. whatever was last measured).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

_CACHE: Optional[Dict[str, str]] = None


def _default_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tuned_defaults.json")


def _load() -> Dict[str, str]:
    global _CACHE
    if _CACHE is None:
        path = os.environ.get("FFCNN_TUNED_DEFAULTS")
        if path == "":
            _CACHE = {}
            return _CACHE
        if path is None:
            path = _default_path()
        try:
            with open(path) as f:
                data = json.load(f)
            _CACHE = {str(k): str(v)
                      for k, v in data.get("flags", {}).items()}
        except (OSError, ValueError):
            _CACHE = {}
    return _CACHE


def get_flag(name: str, default: str) -> str:
    """Resolved value of a perf knob: env > tuned file > ``default``."""
    v = os.environ.get(name)
    if v is not None:
        return v
    return _load().get(name, default)


def invalidate() -> None:
    """Drop the in-process cache (after writing a new tuned file)."""
    global _CACHE
    _CACHE = None
