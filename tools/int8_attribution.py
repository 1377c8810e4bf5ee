#!/usr/bin/env python
"""Attribute int8 mode's accuracy loss to specific blob groups.

VERDICT r3 #4: int8 scores mAP@0.5 = 0.962 vs fast mode's 1.000 on the
differential corpus, but nothing attributed WHICH quantized blobs shift
the boxes.  This sweeps the int8 plan's blob set — leave-one-GROUP-out
(quantize everything except one spatial stage) and one-group-ONLY
(quantize a single stage) — and scores each configuration against the C
conv-v0 oracle with the same VOC-AP metric tools/accuracy_report.py uses.
The group whose EXCLUSION recovers the metric (or whose ONLY run
reproduces the loss alone) is the culprit; the fix is then either a
better scale for those blobs or a policy exclusion.

Groups = eligible int8 blobs bucketed by spatial stage (blob width at
320x320: 160/80/40/20/10 — the same stage structure PERF_NOTES' tiling
and traffic analyses use).  ``--deep GROUP`` adds a per-blob sweep inside
one group.

    /opt/venv/bin/python tools/int8_attribution.py [--images 24] [--deep w20]
"""
import argparse
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c_differential import (REFERENCE, build_reference,  # noqa: E402
                            force_cpu_backend, generate_corpus,
                            run_tpu_batch)

CFG = os.path.join(REFERENCE, "yolo-fastest-1.1.cfg")
WEIGHTS = os.path.join(REFERENCE, "yolo-fastest-1.1.weights")


def eligible_groups(min_channels):
    """Eligible int8 blobs at the flagship geometry, grouped by spatial
    stage (blob width at 320x320 input)."""
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.quant import _int8_blobs

    ir = parse_cfg(CFG, 320, 320)
    groups = defaultdict(list)
    for bi in _int8_blobs(ir, min_channels):
        groups[f"w{ir.blobs[bi].w}"].append(bi)
    return dict(sorted(groups.items(),
                       key=lambda kv: -int(kv[0][1:]))), ir


def score_config(corpus, gt_lines, mode, topk, env):
    """Run the pipeline with ``env`` merged into os.environ, score vs the
    C-oracle lines via accuracy_report.score_lines — the SAME scoring
    implementation the mAP report uses, so the sweep's numbers are
    directly comparable with (and cannot drift from) the report's."""
    from accuracy_report import score_lines
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        pred_lines = {}
        for geo, paths in sorted(corpus.items()):
            t_lines = run_tpu_batch(CFG, WEIGHTS, paths, mode=mode,
                                    topk=topk)
            pred_lines.update(zip(paths, t_lines))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    s = score_lines(corpus, gt_lines, pred_lines)
    rnd = lambda v: round(v, 4) if v is not None else None
    return {"map50": rnd(s["map50"]), "map75": rnd(s["map75"]),
            "mean_iou": rnd(s["mean_matched_iou"]), "n_pred": s["n_pred"]}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images", type=int, default=0,
                    help="cap corpus size (0 = all 48)")
    ap.add_argument("--topk", type=int, default=128)
    ap.add_argument("--minc", type=int,
                    default=int(os.environ.get("FFCNN_INT8_MINC", "32")))
    ap.add_argument("--deep", default=None,
                    help="per-blob sweep inside one group (e.g. w20)")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "device"))
    ap.add_argument("--work-dir", default="/tmp/ffcnn_differential")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        force_cpu_backend()
    groups, ir = eligible_groups(args.minc)
    print("eligible int8 blobs by stage:",
          {k: len(v) for k, v in groups.items()})
    corpus = generate_corpus(os.path.join(args.work_dir, "corpus"),
                             args.images)
    n = sum(len(v) for v in corpus.values())
    binary = build_reference("v0")
    from accuracy_report import collect_gt      # sha1-disk-cached oracle
    gt_lines = collect_gt(corpus, binary, args.work_dir)
    print(f"corpus: {n} images; GT: reference v0")

    results = {}

    def row(label, mode, env):
        r = score_config(corpus, gt_lines, mode, args.topk, env)
        results[label] = dict(r, env=env)
        fmt = lambda v: "n/a " if v is None else f"{v:.4f}"
        print(f"{label:>28s}: mAP@.5 {fmt(r['map50'])}  "
              f"mAP@.75 {fmt(r['map75'])}  meanIoU {fmt(r['mean_iou'])}  "
              f"({r['n_pred']} pred)", flush=True)

    row("fast (float ref)", "fast", {})
    row("int8 full plan", "int8", {})
    for gname, blobs in groups.items():
        row(f"int8 minus {gname} ({len(blobs)})", "int8",
            {"FFCNN_INT8_EXCLUDE_BLOBS": ",".join(map(str, blobs))})
    for gname, blobs in groups.items():
        row(f"int8 only {gname}", "int8",
            {"FFCNN_INT8_ONLY_BLOBS": ",".join(map(str, blobs))})
    if args.deep:
        for bi in groups.get(args.deep, []):
            row(f"int8 minus blob {bi} "
                f"(c={ir.blobs[bi].c})", "int8",
                {"FFCNN_INT8_EXCLUDE_BLOBS": str(bi)})
    print(json.dumps({"minc": args.minc, "corpus_images": n,
                      "groups": {k: v for k, v in groups.items()},
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
