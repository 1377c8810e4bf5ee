#!/usr/bin/env python
"""A/B driver for the fused-REGION experiments (VERDICT r3 #1).

Runs tools/bench_flags.py in a fresh child process per FFCNN_FUSED_*
configuration (fresh process = trustworthy wall numbers through the axon
tunnel; docs/PERF_NOTES.md measurement protocol), with generous timeouts
(whole-backbone regions compile many distinct Mosaic kernels; cold
compiles can take minutes).  Appends one JSON line per config to the
output file so a killed run keeps its partial results.

    /opt/venv/bin/python tools/bench_regions.py [-o /tmp/regions.jsonl]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

# (label, env overrides).  MINC sweeps the channel gate downward with the
# stage-transition blocks fused (FFCNN_FUSED_DOWN) so the C<=16 stages are
# re-scored in stage-spanning regions (round-2 scored them with per-stage
# round-trips); STORE=f32 isolates the dense-f32 boundary-blob trade.
CONFIGS = [
    ("baseline_minc24", {}),
    ("down_minc24", {"FFCNN_FUSED_DOWN": "1"}),
    ("down_minc16", {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "16"}),
    ("down_minc16_f32", {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "16",
                         "FFCNN_FUSED_STORE": "f32"}),
    ("down_minc8", {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "8"}),
    ("down_minc8_f32", {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "8",
                        "FFCNN_FUSED_STORE": "f32"}),
    ("down_minc1_f32", {"FFCNN_FUSED_DOWN": "1", "FFCNN_FUSED_MINC": "1",
                        "FFCNN_FUSED_STORE": "f32"}),
    ("minc16_f32_nodown", {"FFCNN_FUSED_MINC": "16",
                           "FFCNN_FUSED_STORE": "f32"}),
    # halo-cascade: several s1 blocks per launch, boundary blobs VMEM-only
    ("casc3_minc24", {"FFCNN_FUSED_CASCADE": "3"}),
    # r4: the two measured winners combined (casc3_minc24 +3.5%,
    # down_minc24 +1.4% in the r3 partial matrix) + cascade-depth sweep
    ("down_minc24_casc3", {"FFCNN_FUSED_DOWN": "1",
                           "FFCNN_FUSED_CASCADE": "3"}),
    ("casc5_minc24", {"FFCNN_FUSED_CASCADE": "5"}),
    # depth refinement: 0 (37.6k) < 3 (38.9k) > 5 (36.2k) measured — probe
    # the neighbors of the peak
    ("casc2_minc24", {"FFCNN_FUSED_CASCADE": "2"}),
    ("casc4_minc24", {"FFCNN_FUSED_CASCADE": "4"}),
    # cascade WITHOUT down at the C16 stage: every earlier minc16 loss
    # (34.4-35.7k) had FFCNN_FUSED_DOWN=1; casc3 minus down is the r4
    # measured winner direction, so re-score C16 under it
    ("casc3_minc16", {"FFCNN_FUSED_CASCADE": "3",
                      "FFCNN_FUSED_MINC": "16"}),
    ("down_minc24_casc5", {"FFCNN_FUSED_DOWN": "1",
                           "FFCNN_FUSED_CASCADE": "5"}),
    ("down_minc8_f32_casc3", {"FFCNN_FUSED_DOWN": "1",
                              "FFCNN_FUSED_MINC": "8",
                              "FFCNN_FUSED_STORE": "f32",
                              "FFCNN_FUSED_CASCADE": "3"}),
    # NOTE: the CONV0_PALLAS variant is out of the matrix: Mosaic on this
    # toolchain cannot lower the stem's in-kernel batch-to-lanes transpose
    # ("infer-vector-layout: unsupported shape cast") nor a u8 lane
    # transpose — could not lower, see docs/PERF_NOTES.md "Round 3, session 4".
    ("down_minc1_f32_casc3", {"FFCNN_FUSED_DOWN": "1",
                              "FFCNN_FUSED_MINC": "1",
                              "FFCNN_FUSED_STORE": "f32",
                              "FFCNN_FUSED_CASCADE": "3"}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="/tmp/bench_regions.jsonl")
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config labels to run")
    args = ap.parse_args(argv)

    items = [(l, o) for l, o in CONFIGS
             if not args.configs or l in args.configs]
    if args.configs:
        # --configs order is EXECUTION order (value-first queues put the
        # winner-candidate configs before known-broken diagnostics).
        rank = {l: i for i, l in enumerate(args.configs)}
        items.sort(key=lambda t: rank[t[0]])
    for label, overrides in items:
        # FFCNN_TUNED_DEFAULTS="": A/B configs must measure EXPLICIT flags
        # against true code defaults — a tuned file from an earlier
        # apply_tuning run would otherwise contaminate the baseline row.
        # TRACEBACK_FILTERING off so an error row carries the real
        # exception (the r3 minc8 error rows truncated before it).
        env = dict(os.environ, FFCNN_TUNED_DEFAULTS="",
                   JAX_TRACEBACK_FILTERING="off", **overrides)
        # Two attempts per config: bench_flags enables the persistent
        # compile cache, so a run that times out on cold Mosaic compiles
        # (whole-backbone cascades compile many distinct kernels, minutes
        # each) leaves them cached and the retry measures warm.  A retry
        # also recovers from a one-off tunnel hang (CLAUDE.md).
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [PY, os.path.join(REPO, "tools", "bench_flags.py")],
                    env=env, capture_output=True, text=True,
                    timeout=args.timeout)
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout \
                    else ""
                try:
                    rec = json.loads(line)
                except (ValueError, IndexError):
                    # full stderr to a sidecar file: the exception often
                    # sits mid-stream, buried under axon AOT logs
                    errpath = os.path.join(os.path.dirname(args.out)
                                           or ".", f"err_{label}.log")
                    with open(errpath, "w") as ef:
                        ef.write(proc.stderr or "no output")
                    rec = {"error": (proc.stderr or "no output")[-2000:],
                           "stdout_tail": (proc.stdout or "")[-500:],
                           "rc": proc.returncode, "stderr_file": errpath}
            except subprocess.TimeoutExpired:
                rec = {"error": f"timeout {args.timeout}s"}
            if "error" not in rec:
                break
        rec["config"] = label
        rec["env"] = overrides
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
