#!/bin/sh
# Round-4 extra on-chip stages, run by tools/onchip_session_r4.sh after
# the main queue: the C<=16 bisection (VERDICT r3 #2) and the demo-
# geometry (640x448) per-layer profile (VERDICT r3 #7).
set -x
PY=/opt/venv/bin/python
OUT=/tmp/onchip
mkdir -p $OUT
cd "$(dirname "$0")/.."

# 0. cascade-depth refinement around the measured peak (0: 37.6k,
# 3: 38.9k, 5: 36.2k) + re-fold tuned defaults if a neighbor wins.
timeout 5400 $PY tools/bench_regions.py -o $OUT/regions.jsonl --configs \
    casc2_minc24 casc4_minc24 casc3_minc16 >> $OUT/regions.log 2>&1
timeout 300 $PY tools/apply_tuning.py --regions $OUT/regions.jsonl \
    --int8 "$OUT/int8_tuned_*.json" > $OUT/tuning3.json 2>$OUT/tuning3.err

# A. bisect WHY the small-C fused kernels lose: per-component device
# times at the losing geometries, bf16 and f32 storage.
timeout 3000 $PY tools/bisect_smallc.py --store bf16 \
    -o $OUT/bisect_bf16.jsonl > $OUT/bisect_bf16.log 2>&1
timeout 3000 $PY tools/bisect_smallc.py --store f32 \
    -o $OUT/bisect_f32.jsonl > $OUT/bisect_f32.log 2>&1

# B. demo geometry 640x448: per-layer measured-vs-floor profile at the
# reference's published workload (ffcnn.c:573, readme.txt:114-126).
timeout 1800 $PY tools/profile_layers.py 128 640x448 \
    > $OUT/profile_640x448.txt 2>&1

# C. int8 per-channel activation scales (FFCNN_INT8_PERCH, the r4
# accuracy lever): throughput leg — the epilogue multiply becomes a
# vector and fused-run interior int8 falls back to float, so confirm
# ~parity with the scalar plan before any default flip.
MODE=int8 FFCNN_INT8_PERCH=1 timeout 1800 $PY tools/bench_flags.py \
    > $OUT/int8_perch.json 2>$OUT/int8_perch.err

# D. device-side mAP for the winning int8 scheme (per-channel scales +
# corpus calibration — CPU-backend score was 1.000@0.5; confirm the
# TPU backend reproduces it, closing VERDICT r3 #6 for the r4 scheme).
FFCNN_INT8_PERCH=1 timeout 3600 $PY tools/accuracy_report.py \
    --platform device --modes int8 --calib corpus \
    > $OUT/accuracy_tpu_perch.log 2>&1

# F. bench.py-harness cascade A/B (back-to-back, same tunnel window):
# the r4 headline with tuned casc3 (38,102) undercut the r3 headline
# (39,600, different day) even though the bench_regions harness measured
# casc3 +3.5% same-day — decide the default in the harness that records
# the ledger.  Keep casc3 only if it wins here too; else revert.
FFCNN_FUSED_CASCADE=0 timeout 5400 $PY bench.py \
    > $OUT/bench_nocasc.json 2>$OUT/bench_nocasc.log
timeout 5400 $PY bench.py > $OUT/bench_casc3.json 2>$OUT/bench_casc3.log
$PY - <<'PYEOF' > $OUT/casc_reconcile.log 2>&1
import json, os
def ips(p):
    with open(p) as f:
        return json.load(f)["fast_img_s"]
try:
    no, yes = ips("/tmp/onchip/bench_nocasc.json"), \
              ips("/tmp/onchip/bench_casc3.json")
except Exception as e:
    print("A/B incomplete, tuned defaults unchanged:", e)
    raise SystemExit(0)
print(f"bench.py harness: nocasc {no:.1f} vs casc3 {yes:.1f} "
      f"({yes/no:.4f}x)")
path = "ffcnn_tpu/tuned_defaults.json"
if yes < no * 1.01:   # casc3 must confirm >=1% in the ledger harness
    d = json.load(open(path))
    d["flags"].pop("FFCNN_FUSED_CASCADE", None)
    d.setdefault("provenance", {})["casc3_reverted"] = (
        f"bench.py A/B: nocasc {no:.1f} vs casc3 {yes:.1f} — "
        "bench_regions +3.5% did not reproduce in the ledger harness")
    json.dump(d, open(path, "w"), indent=2)
    print("REVERTED casc3 from tuned defaults")
else:
    print("casc3 CONFIRMED in bench.py harness — tuned defaults stand")
PYEOF

# E. re-render the repo digest so stages 0/A-F land in ONCHIP_R4.md
# (the session script's digest stage runs BEFORE this extra hook).
timeout 300 $PY tools/digest_onchip.py >> $OUT/digest.log 2>&1

echo EXTRA DONE
