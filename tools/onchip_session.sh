#!/bin/sh
# The round-3 on-chip measurement queue (docs/ROADMAP.md), unattended.
# Run when the axon tunnel recovers:   sh tools/onchip_session.sh
# Logs land in /tmp/onchip/.  Each stage is independently time-bounded;
# a wedge in one stage doesn't kill the rest (fresh child processes).
#
# Stage ORDER is value-first: if the tunnel recovers late in the round,
# the early stages alone leave a tuned default + a gated headline bench;
# the diagnostics (rows/gaps/stream) come after.
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip
mkdir -p $OUT
cd "$(dirname "$0")/.."

# 0. health gate (retries up to 30 min)
timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health.log 2>&1 || exit 1

# 1. fused-region config matrix (VERDICT r3 #1) — the big lever
timeout 14000 $PY tools/bench_regions.py -o $OUT/regions.jsonl > $OUT/regions.log 2>&1

# 2. int8 A/B (VERDICT r3 #3): plain, minc24 (fused interior boundaries).
# FFCNN_TUNED_DEFAULTS="" so a pre-existing tuned file can't contaminate
# the baseline row (same rule as bench_regions).
MODE=int8 FFCNN_TUNED_DEFAULTS= timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc32.json 2>$OUT/int8_minc32.err
MODE=int8 FFCNN_TUNED_DEFAULTS= FFCNN_INT8_MINC=24 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc24.json 2>$OUT/int8_minc24.err
MODE=int8 FFCNN_TUNED_DEFAULTS= FFCNN_INT8_MINC=24 FFCNN_FUSED_CASCADE=3 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc24_casc3.json 2>$OUT/int8_minc24_casc3.err

# 3. fold the measured winners into tuned defaults (ffcnn_tpu/tuning.py)
# so the round-end bench (and production) runs the best gated config even
# if nobody is around to flip flags by hand.  Conservative: requires both
# golden gates green and a >2% win; no-op otherwise.
timeout 300 $PY tools/apply_tuning.py --regions $OUT/regions.jsonl \
    --int8 "$OUT/int8_*.json" > $OUT/tuning.json 2>$OUT/tuning.err

# 4. headline bench with the (possibly tuned) defaults — records a gated
# number early in case later stages hit a wedge
timeout 5400 $PY bench.py > $OUT/bench.json 2>$OUT/bench.log

# 4b. int8 ON TOP of the tuned defaults (stage 2 measured int8 against
# CODE defaults; if stage 3 folded a regions winner, the int8 knob must
# be re-scored in that context).  apply_tuning is re-run with BOTH
# sources so the merged flags keep the regions winner (the tool
# overwrites tuned_defaults.json wholesale).
MODE=int8 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_tuned_base.json 2>$OUT/int8_tuned_base.err
MODE=int8 FFCNN_INT8_MINC=24 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_tuned_minc24.json 2>$OUT/int8_tuned_minc24.err
timeout 300 $PY tools/apply_tuning.py --regions $OUT/regions.jsonl \
    --int8 "$OUT/int8_tuned_*.json" > $OUT/tuning2.json 2>$OUT/tuning2.err

# 5. VMEM boundary sweep (ADVICE r2 #5 validate branch)
timeout 4000 $PY tools/validate_rows.py -o $OUT/rows.jsonl > $OUT/rows.log 2>&1

# 6. bubble attribution (VERDICT r3 #6)
timeout 1800 $PY tools/trace_gaps.py --batch 256 --iters 10 > $OUT/gaps.log 2>&1

# 6b. per-layer device time WITH roofline floors (measured-vs-floor per
# layer; quantifies every stage's distance from the HBM/MXU wall)
timeout 1800 $PY -m ffcnn_tpu.cli profile --batch 256 --iters 10 > $OUT/profile_floors.txt 2>$OUT/profile_floors.err

# 7. host-input streaming A/B (VERDICT r3 #6, second half): serial
# detect() vs pipelined detect_stream() on distinct host batches.
timeout 1800 $PY tools/bench_stream.py > $OUT/stream.json 2>$OUT/stream.err
MODE=int8 timeout 1800 $PY tools/bench_stream.py > $OUT/stream_int8.json 2>$OUT/stream_int8.err

# 8. TPU-side production-mode drift vs the C binary (CPU numbers in
# PERF_NOTES; this is the honest bf16-on-MXU measurement).  v0 first:
# it is the exact-parity oracle the CPU baseline used — v6 carries its
# own dw5x5-bug slack and is reported for the published-default context.
timeout 5400 $PY tools/c_differential.py --mode fast --platform device \
    --variants v0 v6 --skip-zoo > $OUT/drift_fast_tpu.log 2>&1

# 8b. TPU-side detection-set accuracy (mAP vs the C oracle; CPU-side
# numbers are in PERF_NOTES — this is the honest on-MXU metric)
timeout 3600 $PY tools/accuracy_report.py --platform device \
    --modes fast int8 > $OUT/accuracy_tpu.log 2>&1

# 9. digest the raw /tmp artifacts into the repo so the round carries
# its measured evidence even if nobody is around to write it up
timeout 300 $PY tools/digest_onchip.py > $OUT/digest.log 2>&1

echo DONE
