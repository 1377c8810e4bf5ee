#!/usr/bin/env python
"""Long-running random-graph differential fuzz campaign vs the C binary.

CI pins 4 seeds (tests/test_c_differential.py::test_random_graph_c_
differential); this driver runs an open-ended seed range with the same
generation + acceptance rules, saving a minimal repro directory for any
seed that fails — structural search for parity gaps the fixed corpus
can't reach.

    /opt/venv/bin/python tools/fuzz_campaign.py --start 100 --seeds 200
"""
import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))

import c_differential as cd  # noqa: E402


def run_seed(binary, seed: int, work: str) -> dict:
    from test_random_graphs import SIZE, _gen_cfg

    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.ir import LayerType
    from ffcnn_tpu.darknet.weights import synth_weights_bytes
    from ffcnn_tpu.imageio.bmp import bmp_save

    os.makedirs(work, exist_ok=True)
    rng = np.random.RandomState(seed)
    cfg_text = _gen_cfg(rng, acts=("linear", "leaky", "relu"), c_safe=True)
    cfg = os.path.join(work, "rand.cfg")
    with open(cfg, "w") as f:
        f.write(cfg_text)
    ir = parse_cfg(cfg, SIZE, SIZE)
    wpath = os.path.join(work, "rand.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=seed, obj_bias=1.5))
    paths = []
    for i in range(2):
        img = rng.randint(0, 256, (SIZE, SIZE, 3)).astype(np.uint8)
        p = os.path.join(work, f"img{i}.bmp")
        bmp_save(p, img)
        paths.append(p)
    m_total = sum(3 * ir.blobs[li].w * ir.blobs[li].h
                  for li, l in enumerate(ir.layers)
                  if l.type == LayerType.YOLO)
    res = cd.DiffResult()
    tpu_lines = cd.run_tpu_batch(cfg, wpath, paths, topk=max(m_total, 16))
    for p, tl in zip(paths, tpu_lines):
        cl = cd.run_c(binary, p, cfg, wpath)
        res.record(os.path.basename(p), cl, tl)
    nmax = max((max(i[1], i[2]) for i in res.images), default=0)
    ok = (res.fuzzy_fraction >= 0.8
          and res.max_count_skew <= max(3, int(0.15 * nmax)))
    return {"seed": seed, "ok": bool(ok), "exact": res.exact,
            "set_equal": res.set_equal, "total": res.total,
            "fuzzy": round(res.fuzzy_fraction, 4),
            "count_skew": res.max_count_skew,
            "layers": len(ir.layers),
            "report": None if ok else res.report(f"seed{seed}", True)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=200)
    ap.add_argument("--work-dir", default="/tmp/ffcnn_fuzz")
    ap.add_argument("--out", default="/tmp/ffcnn_fuzz/campaign.jsonl")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "device"),
                    help="cpu (hermetic, the 1000-seed campaign backend) or "
                         "device (the real chip — each seed is a fresh "
                         "compile; use small --seeds counts)")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        cd.force_cpu_backend()
    binary = cd.build_reference("v0")
    os.makedirs(args.work_dir, exist_ok=True)
    n_ok = n_fail = 0
    for seed in range(args.start, args.start + args.seeds):
        work = os.path.join(args.work_dir, f"seed{seed}")
        try:
            rec = run_seed(binary, seed, work)
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"seed": seed, "ok": False, "error": repr(e)}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if rec["ok"]:
            n_ok += 1
            shutil.rmtree(work, ignore_errors=True)   # keep only repros
        else:
            n_fail += 1
            print(f"FAIL seed {seed}: "
                  f"{rec.get('error') or rec.get('report')}",
                  flush=True)
        if (seed - args.start + 1) % 20 == 0:
            print(f"progress: {seed - args.start + 1}/{args.seeds} "
                  f"({n_fail} failures)", flush=True)
    print(json.dumps({"ok": n_ok, "fail": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
