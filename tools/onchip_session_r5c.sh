#!/bin/sh
# Round-5 session-3 on-chip queue (the r5b queue never ran — the VM
# rebooted and /tmp was wiped before the watch fired).  Legs, re-scoped:
#   a. parity-precision A/B (FFCNN_PARITY_PRECISION=high, the 3-pass
#      bf16 scheme): same-window throughput pair + wide-tier DEVICE
#      exactness — HIGH is foldable ONLY if parity stays 1.000 exact.
#   b. the remaining minc8 record (down_minc8, non-f32 store; its f32
#      sibling died rc=1 after a 45-min AOT compile — regions_r5.jsonl).
#   c. informational YOLOv8n throughput row (synthetic weights).
# (The r5b PP-retry leg is dropped: pp_stage_device landed in the r5
#  main queue and is committed — commit 240b2af.)
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip_r5c
mkdir -p $OUT
cd "$(dirname "$0")/.."

timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health.log 2>&1 || exit 1

# a1. parity window pair (same tunnel window, back to back)
MODE=parity FFCNN_TUNED_DEFAULTS= timeout 2400 $PY tools/bench_flags.py \
    > $OUT/parity_base.json 2>$OUT/parity_base.err
MODE=parity FFCNN_TUNED_DEFAULTS= FFCNN_PARITY_PRECISION=high \
    timeout 2400 $PY tools/bench_flags.py \
    > $OUT/parity_high.json 2>$OUT/parity_high.err

# a2. exactness verdict: wide tier on device under HIGH (must be 1.000
# across the board to consider any fold)
FFCNN_PARITY_PRECISION=high timeout 7200 $PY tools/accuracy_report.py \
    --tier wide --platform device --modes parity \
    > $OUT/accuracy_wide_device_parity_high.log 2>&1

# b. the one minc8 config still unrecorded (bf16 store)
timeout 2700 $PY tools/bench_regions.py -o $OUT/regions_r5c.jsonl \
    --configs down_minc8 > $OUT/regions_r5c.log 2>&1

# c. YOLOv8n informational throughput (synthetic weights, deterministic)
$PY - <<'EOF'
import sys
sys.path.insert(0, ".")
from ffcnn_tpu import yolov8
sd = yolov8.synthesize_state_dict(80, "n", seed=0)
cfg, w = yolov8.convert(sd, 80, "n", size=320, conf=0.25)
open("/tmp/v8n_320.cfg", "w").write(cfg)
open("/tmp/v8n_320.weights", "wb").write(w)
print("v8n files written")
EOF
timeout 3600 $PY -m ffcnn_tpu.cli bench --mode fast --batch 256 --size 320 \
    --cfg /tmp/v8n_320.cfg --weights /tmp/v8n_320.weights \
    > $OUT/v8n_bench.log 2>&1
timeout 3600 $PY -m ffcnn_tpu.cli bench --mode fast --batch 64 --size 320 \
    --cfg /tmp/v8n_320.cfg --weights /tmp/v8n_320.weights \
    >> $OUT/v8n_bench.log 2>&1

echo DONE
