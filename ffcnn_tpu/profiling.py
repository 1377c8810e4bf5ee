"""Per-layer / per-layer-type device profiling — the TPU-native analog of
``ENABLE_NET_PROFILE`` + ``net_profile()`` (ffcnn.c:33,494-510,550).

The reference brackets each layer dispatch with a monotonic clock and
accumulates ms per layer *type*.  Under jit the whole graph is one program,
so instead every op is tagged at trace time with its layer via
``jax.named_scope`` (graph/build.py) and a ``jax.profiler`` trace is parsed
to attribute hardware execution time back to layers — giving both the
per-layer table (richer than the reference) and the reference-style
per-type summary.  Works on TPU and CPU device tracks.
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import shutil
import tempfile
from typing import Dict, List, Optional, Tuple

from .darknet.ir import LAYER_TYPE_NAMES, LayerType, NetIR

_SCOPE_RE = re.compile(r"L(\d\d\d)_[a-z]+")


@dataclasses.dataclass
class LayerProfile:
    index: int
    type_name: str
    desc: str
    us_per_step: float


@dataclasses.dataclass
class ProfileReport:
    layers: List[LayerProfile]
    by_type: Dict[str, float]          # type name -> us/step
    other_us: float                    # preprocess/decode/NMS/etc
    total_us: float
    iters: int
    # Optional static roofline floors (roofline.py): layer idx -> floor us.
    # Set by Net.profile_layers so the per-layer table shows how far each
    # measured time sits above its HBM/MXU bound.
    floors_us: Optional[Dict[int, float]] = None

    def render(self, per_layer: bool = True) -> str:
        """net_profile-style text report (per layer type, like
        NET.timeused[] ffcnn.h:45), followed (optionally) by the per-layer
        table — with measured-vs-floor columns when roofline floors are
        attached."""
        lines = ["profile (device us per step, %d steps averaged):"
                 % self.iters]
        for name, us in sorted(self.by_type.items(), key=lambda kv: -kv[1]):
            lines.append("  %-10s %10.1f us  %5.1f%%"
                         % (name, us, 100 * us / max(1e-9, self.total_us)))
        lines.append("  %-10s %10.1f us  %5.1f%%"
                     % ("(pre/post)", self.other_us,
                        100 * self.other_us / max(1e-9, self.total_us)))
        lines.append("  %-10s %10.1f us" % ("total", self.total_us))
        if not per_layer:
            return "\n".join(lines) + "\n"
        lines.append("")
        hdr = "%4s %-9s %-40s %10s" % ("idx", "type", "layer", "us/step")
        if self.floors_us:
            hdr += " %9s %8s" % ("floor us", "x floor")
        lines.append(hdr)
        for lp in self.layers:
            if lp.us_per_step <= 0:
                continue
            row = "%4d %-9s %-40s %10.1f" % (lp.index, lp.type_name,
                                             lp.desc, lp.us_per_step)
            if self.floors_us:
                fl = self.floors_us.get(lp.index, 0.0)
                row += " %9.1f %8s" % (
                    fl, ("%.2f" % (lp.us_per_step / fl)) if fl > 0 else "-")
            lines.append(row)
        return "\n".join(lines) + "\n"


def _layer_desc(ir: NetIR, li: int) -> str:
    layer = ir.layers[li]
    ib, ob = ir.blobs[li], ir.blobs[li + 1]
    if layer.type == LayerType.CONV:
        kind = ("dw%dx%d" % (layer.fs, layer.fs) if layer.groups > 1
                else ("pw1x1" if layer.fs == 1 else "conv%d" % layer.fs))
        return "%s s%d %3dx%3dx%3d->%3dx%3dx%3d" % (
            kind, layer.stride, ib.w, ib.h, ib.c, ob.w, ob.h, ob.c)
    return "%s ->%dx%dx%d" % (LAYER_TYPE_NAMES[layer.type], ob.w, ob.h, ob.c)


def _load_trace_events(trace_dir: str):
    """All traceEvents across every shard the profiler emitted.  JAX can
    write multiple *.trace.json.gz files per session (one per host/plugin);
    reading only the first silently under-counts device time (ADVICE r4).
    pids are a PER-FILE namespace in the Chrome trace format, so each
    event's pid is remapped to (shard_index, pid) before merging —
    otherwise a device pid in one shard can collide with a host pid in
    another and the merged pid→process_name map misclassifies whole
    tracks (r5 review)."""
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise RuntimeError("profiler produced no trace")
    ev = []
    for i, p in enumerate(sorted(paths)):
        with gzip.open(p) as f:
            for e in json.load(f)["traceEvents"]:
                if "pid" in e:
                    e["pid"] = (i, e["pid"])
                ev.append(e)
    return ev


def _device_pids(ev):
    """The (shard, pid) keys belonging to device tracks."""
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    return {p for p, n in pids.items()
            if "TPU" in n or n.startswith("/device:")}


def device_op_time_ms(trace_dir: str, iters: int = 1) -> float:
    """Total device op time per iteration (ms) across all trace shards,
    ``jit_`` parent spans excluded — the one shared implementation behind
    bench.py's batch-1 latency and tools/latency_ladder.py (r5 review:
    keep the parsing in one place)."""
    ev = _load_trace_events(trace_dir)
    dev = _device_pids(ev)
    tot = sum(e.get("dur", 0) for e in ev
              if e.get("ph") == "X" and e.get("pid") in dev
              and not e["name"].startswith("jit_"))
    return tot / iters / 1000.0


def _parse_trace(trace_dir: str, iters: int) -> Tuple[Dict[int, float], float]:
    ev = _load_trace_events(trace_dir)
    dev = _device_pids(ev)
    agg: Dict[int, float] = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        if e["name"].startswith("jit_"):
            continue                        # parent span double-counts
        m = _SCOPE_RE.search(json.dumps(e.get("args") or {}) + e["name"])
        agg[int(m.group(1)) if m else -1] += e.get("dur", 0)
    return ({k: v / iters for k, v in agg.items() if k >= 0},
            agg.get(-1, 0) / iters)


def trace_occupancy(trace_dir: str) -> Dict[str, float]:
    """Device busy time vs span from a profiler trace, as an interval
    union over the device tracks' op events (``jit_`` parent spans
    excluded).  All timestamps are device-side, so host/tunnel RTT shows
    up as *idle* instead of poisoning the measurement — this is the
    overlap metric behind ``tools/bench_stream.py`` (VERDICT r3 #5: does
    a depth-2 ``detect_stream`` actually keep the chip busier than the
    serial loop?).  Returns ``{busy_ms, span_ms, occupancy}``."""
    ev = _load_trace_events(trace_dir)
    dev = _device_pids(ev)
    iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in ev
                if e.get("ph") == "X" and e.get("pid") in dev
                and e.get("dur") and not e["name"].startswith("jit_"))
    if not iv:
        return {"busy_ms": 0.0, "span_ms": 0.0, "occupancy": 0.0}
    busy, cur_s, cur_e = 0.0, iv[0][0], iv[0][1]
    for s, t in iv[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    busy += cur_e - cur_s
    # Span must end at the LATEST end, not the end of the last-starting
    # interval: with an overlapping long op (async DMA, a second device
    # track) iv[-1][1] can precede an earlier op's end, inflating
    # occupancy (worst case to a clamped 1.0).
    span = max(e for _, e in iv) - iv[0][0]
    return {"busy_ms": round(busy / 1e3, 3), "span_ms": round(span / 1e3, 3),
            "occupancy": round(busy / span, 4) if span else 0.0}


def profile_layers(run_step, ir: NetIR, iters: int = 10,
                   trace_dir: Optional[str] = None,
                   runs=None) -> ProfileReport:
    """Profile ``run_step()`` (a zero-arg callable dispatching one jitted
    step; the caller supplies warmed-up args via closure) and attribute
    device time to layers.  Returns a :class:`ProfileReport`.

    ``runs``: optional ``[(start, end), ...]`` fused-region spans active in
    the profiled pipeline — a region's whole device time lands on its
    start-layer scope (``L{start}_fusedrun_to_{end}``), so its row is
    labeled as the region rather than masquerading as the start layer
    alone (whose single-layer floor would overstate "x floor" ~50x)."""
    import jax

    jax.block_until_ready(run_step())      # warm-up / compile
    tmp = trace_dir or tempfile.mkdtemp(prefix="ffcnn_profile_")
    try:
        with jax.profiler.trace(tmp):
            r = None
            for _ in range(iters):
                r = run_step()
            jax.block_until_ready(r)
        per_layer, other = _parse_trace(tmp, iters)
    finally:
        if trace_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)

    run_of = {s: e for s, e in (runs or [])}
    layers = [LayerProfile(li, ("fusedrun" if li in run_of
                                else LAYER_TYPE_NAMES[ir.layers[li].type]),
                           ("region L%03d..L%03d (%d layers)"
                            % (li, run_of[li], run_of[li] - li + 1)
                            if li in run_of else _layer_desc(ir, li)),
                           per_layer.get(li, 0.0))
              for li in range(len(ir.layers))]
    by_type: Dict[str, float] = collections.Counter()
    for lp in layers:
        by_type[lp.type_name] += lp.us_per_step
    total = sum(per_layer.values()) + other
    return ProfileReport(layers=layers, by_type=dict(by_type),
                         other_us=other, total_us=total, iters=iters)
