#!/usr/bin/env python
"""Attribute the wall-vs-trace gap: timeline analysis of a profiler trace
(VERDICT r3 #6).

Op-duration sums (tools/devtime.py) UNDERCOUNT true on-device step time by
the inter-op bubbles; this tool measures the bubbles themselves:

  * module span  — the "jit_*" executable's span on the XLA Modules line =
    true device step time (ramp + ops + gaps)
  * sum(ops)     — op durations on the XLA Ops line within that span
  * gaps         — span minus ops, plus the top individual gaps with the
    ops on each side, so the missing time has a NAME (which fusion
    boundary, infeed, or sync it sits at)

Usage (flagship, batch 256, fast mode):

    /opt/venv/bin/python tools/trace_gaps.py [--batch 256] [--iters 10]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise RuntimeError("profiler produced no trace")
    with gzip.open(paths[0]) as f:
        data = json.load(f)
    return data["traceEvents"]


def analyze_events(ev):
    """Group device-side events into module spans and their member ops.
    Returns a list of dicts, one per module occurrence."""
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or n.startswith("/device:")}
    if not dev_pids:
        print(f"note: no device process in trace; processes = "
              f"{sorted(set(pids.values()))}", file=sys.stderr)
    modules, ops = [], []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        line = tids.get((e["pid"], e["tid"]), "")
        rec = (e["ts"], e.get("dur", 0), e["name"], line)
        if e["name"].startswith("jit_") or "Module" in line:
            modules.append(rec)
        elif "Step" not in line:
            ops.append(rec)
    ops.sort()
    out = []
    for ts, dur, name, line in sorted(modules):
        if dur <= 0:
            continue
        inside = [o for o in ops if ts <= o[0] < ts + dur]
        inside.sort()
        gaps = []
        cur = ts
        prev_name = "<start>"
        for ots, odur, oname, _ in inside:
            if ots > cur:
                gaps.append((ots - cur, prev_name, oname))
            cur = max(cur, ots + odur)
            prev_name = oname
        if ts + dur > cur:
            gaps.append((ts + dur - cur, prev_name, "<end>"))
        out.append({"module": name, "span_us": dur,
                    "ops_us": sum(o[1] for o in inside),
                    "n_ops": len(inside),
                    "gaps": sorted(gaps, reverse=True)})
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="fast")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--keep-trace", default=None,
                    help="directory to keep the raw trace in")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load("/root/reference/yolo-fastest-1.1.cfg",
                   "/root/reference/yolo-fastest-1.1.weights",
                   mode=args.mode)
    img = bmp_load(os.path.join(REPO, "tests", "fixtures", "test320.bmp"))
    batch = np.broadcast_to(img, (args.batch,) + img.shape).copy()
    bj = jnp.asarray(batch)
    jax.block_until_ready(net.detect_device(bj))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = net.detect_device(bj)
    jax.block_until_ready(r)
    wall_ms = (time.perf_counter() - t0) * 1000 / args.iters

    tmp = args.keep_trace or tempfile.mkdtemp(prefix="trace_gaps_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(args.iters):
                r = net.detect_device(bj)
            jax.block_until_ready(r)
        mods = analyze_events(load_events(tmp))
    finally:
        if args.keep_trace is None:
            shutil.rmtree(tmp, ignore_errors=True)

    by_name = collections.defaultdict(list)
    for m in mods:
        by_name[m["module"]].append(m)
    print(f"wall: {wall_ms:.3f} ms/dispatch (iters={args.iters})")
    for name, occ in sorted(by_name.items(),
                            key=lambda kv: -sum(m['span_us']
                                                for m in kv[1])):
        n = len(occ)
        span = sum(m["span_us"] for m in occ) / n
        opsum = sum(m["ops_us"] for m in occ) / n
        print(f"\nmodule {name}  x{n}:  span {span / 1000:.3f} ms, "
              f"ops {opsum / 1000:.3f} ms, bubbles "
              f"{(span - opsum) / 1000:.3f} ms "
              f"({100 * (span - opsum) / max(span, 1):.1f}%)")
        gap_agg = collections.Counter()
        for m in occ:
            for g, a, b in m["gaps"]:
                gap_agg[(a, b)] += g
        for (a, b), g in gap_agg.most_common(args.top):
            print(f"    {g / n:9.1f} us  between {a[:60]!r} and {b[:60]!r}")
    tot_span = sum(m["span_us"] for m in mods) / max(args.iters, 1)
    print(f"\nwall {wall_ms:.3f} ms vs device span total "
          f"{tot_span / 1000:.3f} ms -> host/dispatch overhead "
          f"{wall_ms - tot_span / 1000:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
