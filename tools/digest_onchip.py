#!/usr/bin/env python
"""Digest /tmp/onchip measurement artifacts into docs/ONCHIP_R4.md.

Runs as the LAST stage of tools/onchip_session.sh: the queue's raw
outputs live in /tmp (not committed), so this writes the measured
results into the repo — if the tunnel recovers unattended and the
session ends, the round still carries its on-chip evidence.

    /opt/venv/bin/python tools/digest_onchip.py [--dir /tmp/onchip]
"""
import argparse
import glob
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "ONCHIP_R4.md")


def _jsonl(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        recs.append(json.loads(line))
                    except ValueError:
                        pass
    return recs


def _tail(path, n=30):
    if not os.path.exists(path):
        return None
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    return "\n".join(lines[-n:])


def _err_summary(rec):
    """One-cell summary of an error row: multi-line ANSI stderr tails make
    the markdown table unreadable (r4 minc8/minc1 rows)."""
    err = rec.get("error")
    if err is None:
        return "?"
    if err.startswith("timeout"):
        return err
    import re
    lines = [l for l in re.sub(r"\x1b\[[0-9;]*m", "", err).splitlines()
             if l.strip()]
    tail = lines[-1][:90] if lines else ""
    if "topology description" in tail or "AOT" in tail:
        tail = "stderr ends at axon AOT init (silent compiler death)"
    return "ERROR rc=%s: %s" % (rec.get("rc", "?"), tail)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/onchip")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)
    d = args.dir

    md = ["# On-chip measurement digest (round 4)",
          "",
          f"Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}"
          f" by tools/digest_onchip.py from {d} (raw queue outputs; see"
          " tools/onchip_session.sh for the stages)."]

    regions = _jsonl(os.path.join(d, "regions.jsonl"))
    if regions:
        md += ["", "## Fused-region config matrix (tools/bench_regions.py)",
               "", "| config | img/s | ms/batch | golden | batched golden |",
               "|---|---|---|---|---|"]
        for r in sorted(regions, key=lambda r: -(r.get("img_s") or 0)):
            md.append("| %s | %s | %s | %s | %s |" % (
                r.get("config"), r.get("img_s", _err_summary(r)),
                r.get("ms_batch", "-"), r.get("golden_ok", "-"),
                r.get("golden_batch_ok", "-")))

    int8 = []
    for p in sorted(glob.glob(os.path.join(d, "int8_*.json"))):
        for r in _jsonl(p):
            r["_src"] = os.path.basename(p)
            int8.append(r)
    if int8:
        md += ["", "## int8 A/B (tools/bench_flags.py, MODE=int8)", "",
               "| run | img/s | golden | batched golden |", "|---|---|---|---|"]
        for r in int8:
            md.append("| %s | %s | %s | %s |" % (
                r["_src"], r.get("img_s", _err_summary(r)),
                r.get("golden_ok", "-"), r.get("golden_batch_ok", "-")))

    tuning = _tail(os.path.join(d, "tuning.json"), 60)
    if tuning:
        md += ["", "## Tuned-defaults decision (tools/apply_tuning.py)", "",
               "```json", tuning, "```"]
    tuning2 = _tail(os.path.join(d, "tuning2.json"), 60)
    if tuning2:
        md += ["", "## int8 re-scored on the folded regions winner "
               "(second apply_tuning pass)", "", "```json", tuning2, "```"]
    tuning3 = _tail(os.path.join(d, "tuning3.json"), 60)
    if tuning3:
        md += ["", "## Cascade-depth refinement re-fold "
               "(third apply_tuning pass)", "", "```json", tuning3, "```"]

    bench = _jsonl(os.path.join(d, "bench.json"))
    if bench:
        md += ["", "## Headline bench (bench.py, tuned defaults)", "",
               "```json", json.dumps(bench[-1], indent=1), "```"]

    # Stage F: back-to-back bench.py cascade A/B + automated reconcile
    # (the ledger-harness check that the bench_regions +3.5% is real).
    ab = []
    for name, label in (("bench_nocasc.json", "cascade OFF"),
                        ("bench_casc3.json", "tuned cascade")):
        recs = _jsonl(os.path.join(d, name))
        if recs:
            r = recs[-1]
            ab.append(f"* {label}: **{r.get('fast_img_s')}** img/s fast "
                      f"(int8 {r.get('int8_img_s')})")
    rec_log = _tail(os.path.join(d, "casc_reconcile.log"), 6)
    if ab or rec_log:
        md += ["", "## bench.py-harness cascade A/B (back-to-back, "
               "same tunnel window)", ""] + ab
        if rec_log:
            md += ["", "```", rec_log, "```"]

    for name, title in (("stream.json", "Host-input stream A/B (fast)"),
                        ("stream_int8.json", "Host-input stream A/B (int8)")):
        recs = _jsonl(os.path.join(d, name))
        if recs:
            md += ["", f"## {title}", "", "```json",
                   json.dumps(recs[-1], indent=1), "```"]

    gaps = _tail(os.path.join(d, "gaps.log"), 40)
    if gaps:
        md += ["", "## Wall-vs-trace bubble attribution (tools/trace_gaps.py)",
               "", "```", gaps, "```"]

    prof = _tail(os.path.join(d, "profile_floors.txt"), 40)
    if prof:
        md += ["", "## Measured-vs-floor profile (ffcnn profile, batch 256)",
               "", "```", prof, "```"]

    drift = _tail(os.path.join(d, "drift_fast_tpu.log"), 12)
    if drift:
        md += ["", "## TPU-side fast-mode drift vs the C binary", "",
               "```", drift, "```"]

    acc = _tail(os.path.join(d, "accuracy_tpu.log"), 12)
    if acc:
        md += ["", "## TPU-side detection-set accuracy "
               "(tools/accuracy_report.py, C v0 oracle as ground truth)",
               "", "```", acc, "```"]

    acc_perch = _tail(os.path.join(d, "accuracy_tpu_perch.log"), 12)
    if acc_perch:
        md += ["", "## TPU-side int8 accuracy, per-channel scales + corpus "
               "calibration (the r4 scheme; CPU score was 1.000@0.5)",
               "", "```", acc_perch, "```"]

    for store in ("bf16", "f32"):
        bis = _jsonl(os.path.join(d, f"bisect_{store}.jsonl"))
        if bis:
            md += ["", f"## C<=16 fused-kernel bisection, store={store} "
                   "(tools/bisect_smallc.py, us/block, chained device time)",
                   "", "| geom | MB dense/tiled | copy | dwonly | pwonly "
                   "| full | xla | tpose |", "|---|---|---|---|---|---|---|---|"]
            for r in bis:
                md.append("| %s | %s/%s | %s | %s | %s | %s | %s | %s |" % (
                    r.get("geom"), r.get("dense_MB", "-"),
                    r.get("tiled_MB", "-"), r.get("copy", "-"),
                    r.get("dwonly", "-"), r.get("pwonly", "-"),
                    r.get("full", "-"), r.get("xla", "-"),
                    r.get("tpose", "-")))

    prof640 = _tail(os.path.join(d, "profile_640x448.txt"), 45)
    if prof640:
        md += ["", "## Demo-geometry profile (640x448, batch 128 — the "
               "reference's published workload, readme.txt:114-126)",
               "", "```", prof640, "```"]

    rows = _jsonl(os.path.join(d, "rows.jsonl"))
    if rows:
        md += ["", "## VMEM rows boundary sweep (tools/validate_rows.py)", "",
               f"{len(rows)} records; failures: "
               f"{sum(1 for r in rows if not r.get('ok', True))} — raw in "
               f"{d}/rows.jsonl"]

    if len(md) <= 3:
        md += ["", "(no artifacts found — queue has not run)"]
    with open(args.out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {args.out} ({len(md)} lines)")
    return 0


if __name__ == "__main__":
    main()
