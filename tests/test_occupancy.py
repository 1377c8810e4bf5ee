"""trace_occupancy: interval-union busy/span math on a synthetic trace
(the TPU device track shape tools/bench_stream.py's overlap metric
parses; VERDICT r3 #5)."""
import gzip
import json
import os

import pytest

from ffcnn_tpu.profiling import trace_occupancy


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    doc = {"traceEvents": [
        {"ph": "M", "name": "process_name", "pid": 7,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 9,
         "args": {"name": "/host:CPU"}},
    ] + events}
    with gzip.open(d / "t.trace.json.gz", "wt") as f:
        json.dump(doc, f)
    return str(tmp_path)


def _ev(pid, ts, dur, name="fusion.1"):
    return {"ph": "X", "pid": pid, "ts": ts, "dur": dur, "name": name}


def test_union_merges_overlaps_and_measures_gaps(tmp_path):
    # busy: [0,10] u [5,20] u [40,50] = 30; span 0..50
    d = _write_trace(tmp_path, [
        _ev(7, 0, 10), _ev(7, 5, 15), _ev(7, 40, 10),
        _ev(9, 0, 1000),                      # host events ignored
        _ev(7, 0, 60, name="jit_step"),       # parent span ignored
    ])
    occ = trace_occupancy(d)
    assert occ["busy_ms"] == pytest.approx(0.030)
    assert occ["span_ms"] == pytest.approx(0.050)
    assert occ["occupancy"] == pytest.approx(0.6)


def test_empty_device_track(tmp_path):
    d = _write_trace(tmp_path, [_ev(9, 0, 100)])
    occ = trace_occupancy(d)
    assert occ == {"busy_ms": 0.0, "span_ms": 0.0, "occupancy": 0.0}


def test_missing_trace_raises(tmp_path):
    with pytest.raises(RuntimeError):
        trace_occupancy(str(tmp_path))
