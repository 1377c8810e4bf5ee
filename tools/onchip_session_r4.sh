#!/bin/sh
# Round-4 unattended on-chip measurement queue (VERDICT r3 "Next round"
# items #1-#7).  Differences from tools/onchip_session.sh (r3):
#   * regions.jsonl is SEEDED from the committed partial snapshot
#     (ONCHIP_PARTIAL_r04_regions.jsonl, good rows only) so already-
#     measured configs aren't redone; only the missing configs + the new
#     winner-combo configs (down_minc24_casc3, casc5 sweep) run.
#   * a final hook runs tools/onchip_extra_r4.sh if present (the C<=16
#     bisection + 640x448 profiling stages, written while this runs).
# Logs land in /tmp/onchip/.  Each stage is independently time-bounded.
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip
mkdir -p $OUT
cd "$(dirname "$0")/.."

# 0. health gate (retries up to 30 min)
timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health.log 2>&1 || exit 1

# 1. fused-region config matrix: seed good rows, run only the rest.
# Seed source is the committed final r4 snapshot (the mid-queue partial
# this queue originally seeded from was superseded and deleted); guard
# the grep so a missing/empty seed never leaves an empty regions.jsonl
# behind the [ ! -f ] check (that would skip baseline/casc3 rows and
# contaminate the apply_tuning fold).
if [ ! -f $OUT/regions.jsonl ]; then
  grep '"img_s"' docs/onchip_r4/regions.jsonl > $OUT/regions.jsonl \
    || rm -f $OUT/regions.jsonl
fi
# --configs order = execution order: winner-candidate combos first, the
# known-erroring minc8/minc1 diagnostics last (each can burn 2x1500 s).
timeout 14000 $PY tools/bench_regions.py -o $OUT/regions.jsonl --configs \
    down_minc24_casc3 casc5_minc24 down_minc24_casc5 \
    down_minc8_f32_casc3 down_minc1_f32_casc3 \
    down_minc8 down_minc8_f32 down_minc1_f32 \
    > $OUT/regions.log 2>&1

# 2. int8 A/B (VERDICT r3 #4): plain, minc24 (fused interior boundaries).
MODE=int8 FFCNN_TUNED_DEFAULTS= timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc32.json 2>$OUT/int8_minc32.err
MODE=int8 FFCNN_TUNED_DEFAULTS= FFCNN_INT8_MINC=24 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc24.json 2>$OUT/int8_minc24.err
MODE=int8 FFCNN_TUNED_DEFAULTS= FFCNN_INT8_MINC=24 FFCNN_FUSED_CASCADE=3 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_minc24_casc3.json 2>$OUT/int8_minc24_casc3.err

# 3. fold the measured winners into tuned defaults (ffcnn_tpu/tuning.py)
timeout 300 $PY tools/apply_tuning.py --regions $OUT/regions.jsonl \
    --int8 "$OUT/int8_*.json" > $OUT/tuning.json 2>$OUT/tuning.err

# 4. headline bench with the (possibly tuned) defaults
timeout 5400 $PY bench.py > $OUT/bench.json 2>$OUT/bench.log

# 4b. int8 ON TOP of the tuned defaults
MODE=int8 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_tuned_base.json 2>$OUT/int8_tuned_base.err
MODE=int8 FFCNN_INT8_MINC=24 timeout 1800 $PY tools/bench_flags.py > $OUT/int8_tuned_minc24.json 2>$OUT/int8_tuned_minc24.err
timeout 300 $PY tools/apply_tuning.py --regions $OUT/regions.jsonl \
    --int8 "$OUT/int8_tuned_*.json" > $OUT/tuning2.json 2>$OUT/tuning2.err

# 5. bubble attribution (VERDICT r3 #3)
timeout 1800 $PY tools/trace_gaps.py --batch 256 --iters 10 > $OUT/gaps.log 2>&1

# 5b. per-layer device time WITH roofline floors
timeout 1800 $PY -m ffcnn_tpu.cli profile --batch 256 --iters 10 > $OUT/profile_floors.txt 2>$OUT/profile_floors.err

# 6. host-input streaming A/B (VERDICT r3 #5)
timeout 1800 $PY tools/bench_stream.py > $OUT/stream.json 2>$OUT/stream.err

# 7. TPU-side production-mode drift vs the C binary (VERDICT r3 #6)
timeout 5400 $PY tools/c_differential.py --mode fast --platform device \
    --variants v0 v6 --skip-zoo > $OUT/drift_fast_tpu.log 2>&1

# 7b. TPU-side detection-set accuracy (mAP vs the C oracle)
timeout 3600 $PY tools/accuracy_report.py --platform device \
    --modes fast int8 > $OUT/accuracy_tpu.log 2>&1

# 8. VMEM boundary sweep
timeout 4000 $PY tools/validate_rows.py -o $OUT/rows.jsonl > $OUT/rows.log 2>&1

# 9. digest the raw /tmp artifacts into the repo
timeout 300 $PY tools/digest_onchip.py > $OUT/digest.log 2>&1

# 10. round-4 extra stages, written while the queue above runs
if [ -f tools/onchip_extra_r4.sh ]; then
  sh tools/onchip_extra_r4.sh >> $OUT/extra.log 2>&1
fi

echo DONE
