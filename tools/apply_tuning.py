#!/usr/bin/env python
"""Turn on-chip A/B results into tuned defaults (ffcnn_tpu/tuning.py).

Reads the fused-region config matrix (tools/bench_regions.py jsonl) and
optional int8 A/B records (tools/bench_flags.py json files run with
MODE=int8), picks the fastest configuration whose golden gates passed,
and — only when it beats the measured baseline by a real margin — writes
``ffcnn_tpu/tuned_defaults.json`` so production picks the winner up by
default (the reference's PGO analog, build.sh:35-41).  Conservative by
construction:

  * a config is eligible only with BOTH golden gates green
    (single-image `golden_ok` AND batched `golden_batch_ok`);
  * the win must exceed ``--margin`` (default 2%) over the in-matrix
    baseline — tunnel-noise-sized wins don't flip defaults;
  * int8 knobs are tuned only against the int8 baseline, and int8 never
    becomes the default MODE here (bench.py already reports both).

    /opt/venv/bin/python tools/apply_tuning.py \
        --regions /tmp/onchip/regions.jsonl \
        --int8 /tmp/onchip/int8_*.json [--dry-run]
"""
import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "ffcnn_tpu", "tuned_defaults.json")

# Knobs apply_tuning is allowed to set (everything else stays env-only).
TUNABLE = ("FFCNN_FUSED_DOWN", "FFCNN_FUSED_MINC", "FFCNN_FUSED_STORE",
           "FFCNN_FUSED_CASCADE", "FFCNN_CONV0_PALLAS", "FFCNN_INT8_MINC")


def _load_jsonl(path):
    recs = []
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        recs.append(json.loads(line))
                    except ValueError:
                        pass
    return recs


def _gated(rec):
    return (rec.get("golden_ok") is True
            and rec.get("golden_batch_ok") is True
            and isinstance(rec.get("img_s"), (int, float)))


def pick_regions(recs, margin):
    """(winner_env, decision_dict) from the region matrix; winner_env is
    {} when the baseline stands."""
    gated = [r for r in recs if _gated(r)]
    base = next((r for r in gated if not r.get("env")), None)
    decision = {"eligible": len(gated), "total": len(recs),
                "baseline_img_s": base["img_s"] if base else None}
    if base is None or not gated:
        decision["verdict"] = "no gated baseline — defaults unchanged"
        return {}, decision
    best = max(gated, key=lambda r: r["img_s"])
    decision.update(best_config=best.get("config"),
                    best_img_s=best["img_s"],
                    speedup=round(best["img_s"] / base["img_s"], 4))
    if best["img_s"] < base["img_s"] * (1.0 + margin):
        decision["verdict"] = (f"best win {decision['speedup']}x under "
                               f"{1 + margin}x margin — defaults unchanged")
        return {}, decision
    env = {k: v for k, v in (best.get("env") or {}).items() if k in TUNABLE}
    decision["verdict"] = f"tuned: {env}"
    return env, decision


def pick_int8(paths, margin):
    """int8-knob records (MODE=int8 bench_flags runs).  The record whose
    env is empty-of-tunables is the int8 baseline (minc32)."""
    recs = []
    for p in paths:
        for q in glob.glob(p):
            rs = _load_jsonl(q)           # also accepts single-line json
            for r in rs:
                r.setdefault("env", {})
                r["_src"] = os.path.basename(q)
                recs.append(r)
    gated = [r for r in recs if _gated(r)]
    decision = {"eligible": len(gated), "total": len(recs)}
    if not gated:
        decision["verdict"] = "no gated int8 records"
        return {}, decision
    # The baseline must be a genuinely env-free (code-default) run; if it
    # errored or failed its gate, skip rather than compare tuned-vs-tuned.
    bases = [r for r in gated if not (r.get("env") or {})]
    if not bases:
        decision["verdict"] = "no gated env-free int8 baseline — skip"
        return {}, decision
    base = max(bases, key=lambda r: r["img_s"])
    best = max(gated, key=lambda r: r["img_s"])
    decision.update(baseline_img_s=base["img_s"], best_img_s=best["img_s"],
                    best_src=best["_src"],
                    speedup=round(best["img_s"] / base["img_s"], 4))
    if best is base or best["img_s"] < base["img_s"] * (1.0 + margin):
        decision["verdict"] = "int8 baseline stands"
        return {}, decision
    env = {k: v for k, v in (best.get("env") or {}).items()
           if k == "FFCNN_INT8_MINC"}
    decision["verdict"] = f"tuned: {env}" if env else "int8 baseline stands"
    return env, decision


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", default=None)
    ap.add_argument("--int8", nargs="*", default=[])
    ap.add_argument("--margin", type=float, default=0.02)
    ap.add_argument("--out", default=OUT_PATH)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    flags = {}
    report = {}
    env_r, dec_r = pick_regions(_load_jsonl(args.regions), args.margin)
    flags.update(env_r)
    report["regions"] = dec_r
    if args.int8:
        env_i, dec_i = pick_int8(args.int8, args.margin)
        flags.update(env_i)
        report["int8"] = dec_i

    report["flags"] = flags
    print(json.dumps(report, indent=2))
    if args.dry_run:
        return 0
    if not flags:
        # Nothing beat the baseline: leave any existing tuned file alone
        # (it reflects an earlier measured win; absence of a NEW win is
        # not evidence against it — delete manually to reset).
        return 0
    doc = {"flags": flags,
           "provenance": {
               "written_by": "tools/apply_tuning.py",
               "time": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
               "decision": report}}
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, args.out)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
