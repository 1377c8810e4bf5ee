#!/usr/bin/env python
"""Oracle-parity fuzz campaign over the FULL framework dialect.

tools/fuzz_campaign.py fuzzes against the C binary, so it is limited to
the C dialect (no mish, no route groups, no dropout-alias graphs — the
reference crashes or mis-parses those).  This campaign fuzzes the full
dialect against the NumPy oracle (oracle/numpy_ref.py, the semantic
source of truth): random graphs with mish activations, route
groups/group_id, and dropout-aliased route/shortcut references, compared
on the complete pre-NMS candidate stream (class exact, numerics 1e-3).

    /opt/venv/bin/python tools/fuzz_oracle.py --start 2000 --seeds 500
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run_seed(seed: int) -> dict:
    from test_model_zoo import _jax_candidates
    from test_random_graphs import SIZE, _gen_cfg

    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
    from ffcnn_tpu.oracle import numpy_ref

    rng = np.random.RandomState(seed)
    cfg_text = _gen_cfg(rng)                 # full dialect, not c_safe
    ir = parse_cfg(cfg_text, SIZE, SIZE, is_path=False)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=seed,
                                                     obj_bias=1.5))
    img = rng.randint(0, 256, (SIZE, SIZE, 3)).astype(np.uint8)
    x, _, _ = numpy_ref.letterbox(img, SIZE, SIZE, (0.0,) * 3,
                                  (1 / 255.0,) * 3)
    want = numpy_ref.net_candidates(ir, params, x)
    got = _jax_candidates(ir, params, img, SIZE)
    # threshold knife edges (f32 vs f64 conf on either side of
    # ignore_thresh): drop near-threshold extras before the exact compare
    thresh = max((l.ignore_thres for l in ir.layers
                  if l.type.name == "YOLO"), default=0.0)
    if len(want) != len(got):
        keep = lambda lst: [cd for cd in lst if cd[1] > thresh + 1e-4]
        want, got = keep(want), keep(got)
    ok = len(want) == len(got)
    worst = 0.0
    if ok:
        for g, w in zip(got, want):
            if g[0] != w[0]:
                ok = False
                break
            worst = max(worst, float(np.max(np.abs(
                np.asarray(g[1:]) - np.asarray(w[1:])))))
        ok = ok and worst <= 1e-3 * (1 + SIZE)
    return {"seed": seed, "ok": bool(ok), "n_candidates": len(want),
            "groups": "group_id" in cfg_text, "mish": "mish" in cfg_text,
            "worst_dev": round(worst, 6),
            "cfg": None if ok else cfg_text}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=2000)
    ap.add_argument("--seeds", type=int, default=500)
    ap.add_argument("--out", default="/tmp/ffcnn_fuzz/oracle.jsonl")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    n_ok = n_fail = n_groups = n_mish = 0
    for seed in range(args.start, args.start + args.seeds):
        try:
            rec = run_seed(seed)
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"seed": seed, "ok": False, "error": repr(e)}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        n_ok += rec["ok"]
        n_fail += not rec["ok"]
        n_groups += bool(rec.get("groups"))
        n_mish += bool(rec.get("mish"))
        if not rec["ok"]:
            print(f"FAIL seed {seed}: "
                  f"{rec.get('error') or 'candidate mismatch'}", flush=True)
        if (seed - args.start + 1) % 50 == 0:
            print(f"progress: {seed - args.start + 1}/{args.seeds} "
                  f"({n_fail} failures, {n_groups} groups, {n_mish} mish)",
                  flush=True)
    print(json.dumps({"ok": n_ok, "fail": n_fail,
                      "groups_graphs": n_groups, "mish_graphs": n_mish}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
