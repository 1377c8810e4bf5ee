#!/bin/sh
# Round-5 unattended on-chip measurement queue (VERDICT r4 "Next round"
# items #1, #3, #4, #6, #7, #8).  Logs land in /tmp/onchip/.  Each stage
# is independently time-bounded; value-first ordering so a flaky tunnel
# still records the headline.
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip_r5
mkdir -p $OUT
cd "$(dirname "$0")/.."

# 0. health gate (retries up to 30 min)
timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health.log 2>&1 || exit 1

# 1. headline bench FIRST (new protocol: fast-pinned median of 5 windows,
# parity_img_s row) — the one artifact the round must not lose.
timeout 5400 $PY bench.py > $OUT/bench.json 2>$OUT/bench.log

# 2. retest discipline (VERDICT #8): backend-bug probes incl. the fixed
# wedge reproducers — run BEFORE the minc8 leg that depends on the fix.
timeout 2400 $PY tools/retest_backend_bugs.py --device --include-wedges \
    --out $OUT/backend_bugs.jsonl > $OUT/retest.log 2>&1

# 3. the now-compilable minc8 stem->region handoff (VERDICT #3): replaces
# the analytic 810us estimate with device truth.  casc3 combo included.
timeout 10000 $PY tools/bench_regions.py -o $OUT/regions_r5.jsonl --configs \
    down_minc8_f32 down_minc8 down_minc8_f32_casc3 \
    > $OUT/regions_r5.log 2>&1

# 4. wide-tier accuracy on the DEVICE backend (VERDICT #4): the 62 harder
# images are where backend rounding could diverge from the CPU scoring.
timeout 7200 $PY tools/accuracy_report.py --tier wide --platform device \
    --modes fast parity > $OUT/accuracy_wide_device.log 2>&1

# 5. latency ladder (VERDICT #6): batch 1/8/32/64 wall-p50 + device time.
timeout 3600 $PY tools/latency_ladder.py --mode fast \
    -o $OUT/latency_ladder.jsonl > $OUT/latency_ladder.log 2>&1

# 6. real-chip PP stage-body timing (VERDICT #7).
timeout 3600 $PY tools/pp_stage_device.py --iters 20 \
    > $OUT/pp_stage_device.log 2>&1

# 7. f32-stage device A/B: only if the CPU bisection named a winner stage
# (written to $OUT/f32_stage_winner by the builder); measures the <2%
# throughput-cost condition for folding the accuracy fix.
if [ -f $OUT/f32_stage_winner ]; then
  W=$(cat $OUT/f32_stage_winner)
  FFCNN_TUNED_DEFAULTS= timeout 1800 $PY tools/bench_flags.py \
      > $OUT/f32_base.json 2>$OUT/f32_base.err
  FFCNN_TUNED_DEFAULTS= FFCNN_F32_STAGES="$W" timeout 1800 $PY \
      tools/bench_flags.py > $OUT/f32_stage.json 2>$OUT/f32_stage.err
fi

# 8. wide-tier int8 on device (informational; one row for the table)
timeout 5400 $PY tools/accuracy_report.py --tier wide --platform device \
    --modes int8 --calib corpus > $OUT/accuracy_wide_device_int8.log 2>&1

echo DONE
