#!/bin/sh
# Round-4 extra-session on-chip queue (run under tools/onchip_watch_r4b.sh).
#
# Legs:
#   1. packed-argmax ledger A/B — the 2026-08-19 toolchain fixed the
#      reduce+bitcast fusion livelock (docs/onchip_r4/retest_wedges.jsonl),
#      reopening the single-reduction argmax (ops/yolo.py::_argmax_max_packed).
#      Three interleaved (variadic, packed) bench_flags pairs; if packed's
#      median paired delta is >= +1%, a back-to-back bench.py pair decides
#      the default flip (fold rule, docs/PERF_NOTES.md "Round 4").
#   2. device fuzz extension — 50 more random-graph differential seeds on
#      the real chip (seeds 110-159; 100-109 are docs/onchip_r4/
#      fuzz_device.jsonl), structural search under the MXU's numerics.
#
# Logs land in /tmp/onchip/.  Each stage independently time-bounded.
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip
mkdir -p $OUT
cd "$(dirname "$0")/.."

# 0. health gate (retries up to 30 min)
timeout 2100 $PY tools/tpu_health.py --wait 30 > $OUT/health_r4b.log 2>&1 || exit 1

# 1. argmax A/B: interleaved pairs, fresh process each (full-net hang
# pathology strikes single runs; the compile cache makes retries cheap).
: > $OUT/argmax_ab.jsonl
for pair in 1 2 3; do
  timeout 1500 $PY tools/bench_flags.py \
      >> $OUT/argmax_ab.jsonl 2> $OUT/argmax_var$pair.err
  FFCNN_ARGMAX=packed timeout 1500 $PY tools/bench_flags.py \
      >> $OUT/argmax_ab.jsonl 2> $OUT/argmax_pck$pair.err
done

# 1b. decide: median paired delta >= +1% -> bench.py confirm pair
if $PY - <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open("/tmp/onchip/argmax_ab.jsonl")]
rows = [r for r in rows if r.get("golden_ok") and r.get("golden_batch_ok")]
var = [r["img_s"] for r in rows if not r["env"].get("FFCNN_ARGMAX")]
pck = [r["img_s"] for r in rows if r["env"].get("FFCNN_ARGMAX") == "packed"]
if not var or not pck:
    print("argmax A/B: insufficient gated rows", var, pck); sys.exit(1)
d = [(p - v) / v for v, p in zip(var, pck)]
med = statistics.median(d)
print("argmax A/B deltas:", [round(x, 4) for x in d], "median", round(med, 4))
sys.exit(0 if med >= 0.01 else 1)
EOF
then
  echo "packed argmax candidate -> bench.py confirm pair" >> $OUT/argmax_ab.log
  timeout 2400 $PY bench.py > $OUT/bench_argmax_var.json 2>$OUT/bench_argmax_var.log
  FFCNN_ARGMAX=packed timeout 2400 $PY bench.py \
      > $OUT/bench_argmax_pck.json 2>$OUT/bench_argmax_pck.log
fi

# 2. device fuzz extension (each seed = fresh small-net compile; generous)
timeout 12000 $PY tools/fuzz_campaign.py --platform device \
    --start 110 --seeds 50 --work-dir /tmp/ffcnn_fuzz_dev \
    --out $OUT/fuzz_device2.jsonl > $OUT/fuzz_device2.log 2>&1

echo "R4B QUEUE COMPLETE @ $(date -u +%H:%M:%S)"
