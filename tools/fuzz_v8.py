#!/usr/bin/env python
"""Extended random-backbone fuzz for the anchor-free [yolov8] head.

Evidence-run companion to tests/test_random_graphs.py::
test_random_graph_oracle_parity_v8 (4 CI seeds): same differential —
random darknet backbone + [yolov8] head with random reg_max/stride,
jitted pipeline vs the NumPy oracle on the pre-NMS candidate stream —
over an arbitrary seed range, one line per seed + a jsonl ledger.

  /opt/venv/bin/python tools/fuzz_v8.py --seeds 25 --out /tmp/fuzz_v8.jsonl

CPU-only (the oracle side is NumPy); device-side v8 validation is
tools/v8_device_check.py.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ffcnn_tpu.darknet.cfg import parse_cfg  # noqa: E402
from ffcnn_tpu.darknet.weights import (load_weights,  # noqa: E402
                                       synth_weights_bytes)
from ffcnn_tpu.oracle import numpy_ref  # noqa: E402


def run_seed(seed: int) -> dict:
    from test_random_graphs import SIZE, _gen_cfg, _jax_candidates_v8

    rng = np.random.RandomState(2000 + seed)
    cfg = _gen_cfg(rng, head="yolov8")
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=seed))
    img = rng.randint(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)

    x, _, _ = numpy_ref.letterbox(img, SIZE, SIZE, (0.0,) * 3,
                                  (1 / 255.0,) * 3)
    want = numpy_ref.net_candidates(ir, params, x)
    got = _jax_candidates_v8(ir, params, img, SIZE)
    rec = {"seed": seed, "layers": len(ir.layers),
           "n_oracle": len(want), "n_jit": len(got)}
    if not want:
        # vacuous only if the jit side is ALSO empty — jit-only
        # candidates on an oracle-empty seed are a decode regression
        rec["status"] = "VACUOUS" if not got else "JIT_ONLY_CANDIDATES"
        return rec
    thresh = max(l.ignore_thres for l in ir.layers
                 if l.type.name == "YOLOV8")
    if len(want) != len(got):        # f32-vs-f64 threshold knife-edges
        keep = lambda lst: [cd for cd in lst if cd[1] > thresh + 1e-4]
        want, got = keep(want), keep(got)
        rec["knife_edge_filtered"] = True
    if len(want) != len(got):
        rec["status"] = "COUNT_MISMATCH"
        return rec
    max_d = 0.0
    for g, w_ in zip(got, want):
        if g[0] != w_[0]:
            rec["status"] = "CLASS_MISMATCH"
            return rec
        max_d = max(max_d, float(np.max(np.abs(
            np.asarray(g[1:]) - np.asarray(w_[1:])))))
    rec["max_abs_delta"] = max_d
    rec["status"] = "PASS" if max_d < 1e-3 else "DELTA_EXCEEDED"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=25)
    ap.add_argument("--out", default="/tmp/fuzz_v8.jsonl")
    args = ap.parse_args()
    n_pass = 0
    with open(args.out, "a") as f:
        for s in range(args.start, args.start + args.seeds):
            t0 = time.time()
            try:
                rec = run_seed(s)
            except Exception as e:  # record, keep sweeping
                rec = {"seed": s, "status": "ERROR",
                       "error": f"{type(e).__name__}: {e}"[:300]}
            rec["s"] = round(time.time() - t0, 1)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print("seed %3d: %-16s %s" % (s, rec["status"],
                  {k: v for k, v in rec.items()
                   if k not in ("seed", "status")}))
            n_pass += rec["status"] in ("PASS", "VACUOUS")
    total = args.seeds
    print("v8 fuzz: %d/%d PASS" % (n_pass, total))
    return 0 if n_pass == total else 1


if __name__ == "__main__":
    sys.exit(main())
