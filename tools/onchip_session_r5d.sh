#!/bin/sh
# Round-5 session-4 on-chip queue.  Three legs, all follow-ups to r5c:
#   a. same-window INTERLEAVED parity-precision A/B (bench_parity_ab.py)
#      — the fold is already decided NO on exactness grounds (PERF_NOTES
#      "Parity-precision knob"); this pins the +14.4% adjacent-window
#      speedup with the stronger interleaved protocol for the record.
#   b. YOLOv8n informational throughput, re-run with the device-resident
#      input fix (commit 70a8e9e) — the r5c leg measured per-iteration
#      78 MB host uploads through the tunnel (74 img/s artifact).
#   c. v8 cross-backend numeric differential (tools/v8_device_check.py):
#      CPU-vs-device pre-NMS candidate tensors, the device-side
#      validation the C binary can't provide for [yolov8] graphs.
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip_r5d
mkdir -p $OUT
cd "$(dirname "$0")/.."

timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health.log 2>&1 || exit 1

# a. interleaved parity A/B (batch 256, 5 window pairs)
timeout 2400 $PY tools/bench_parity_ab.py 256 5 \
    > $OUT/parity_ab.json 2>$OUT/parity_ab.err

# b. v8n throughput with device-resident input (synthetic weights)
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
for B in 256 64; do
  timeout 3600 $PY -m ffcnn_tpu.cli bench --mode fast --batch $B --size 320 \
      --cfg /tmp/v8n_320.cfg --weights /tmp/v8n_320.weights \
      >> $OUT/v8n_bench.log 2>&1
done
# parity-mode v8n row too (the accuracy-exact configuration)
timeout 3600 $PY -m ffcnn_tpu.cli bench --mode parity --batch 256 --size 320 \
    --cfg /tmp/v8n_320.cfg --weights /tmp/v8n_320.weights \
    >> $OUT/v8n_bench.log 2>&1

# c. v8 cross-backend numeric differential (CPU vs device, pre-NMS
#    candidate tensor in fixed grid order — the device-side validation
#    the C binary can't provide for [yolov8] graphs)
timeout 3600 $PY tools/v8_device_check.py --out $OUT/v8chk \
    > $OUT/v8_device_check.json 2>$OUT/v8_device_check.err

echo DONE
