#!/usr/bin/env python
"""Localize fast mode's wide-corpus bf16 drift with a per-stage f32 sweep.

VERDICT r4 #2: fast mode (bf16 activations, f32 MXU accumulation) scores
wmAP@0.5 = 0.961 on the 110-image wide tier — 3 dropped + 2 duplicate
knife-edge boxes vs the C conv-v0 oracle — and FFCNN_HEAD_F32 refuted the
head chains as the source.  This sweep forces ONE spatial stage at a time
to compute and store f32 (FFCNN_F32_STAGES, stage-local: the forcing casts
back to bf16 at the stage exit — net.py/_build_pipeline, graph/build.py)
and scores each configuration with the SAME VOC-AP implementation the
accuracy report uses (accuracy_report.score_lines), so the numbers are
directly comparable with the PERF_NOTES wide table.

If one stage recovers wmAP@0.5 >= 0.99, it names the culprit and the
candidate default flip (pending a <2% throughput A/B on the device); if
none does, the drift is distributed and parity mode is the accuracy
product (the bench.py parity_img_s row).

    /opt/venv/bin/python tools/bisect_f32stage.py --tier wide
    # one JSON line at the end: {"results": {...}, ...}
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c_differential import (REFERENCE, build_reference,  # noqa: E402
                            force_cpu_backend, generate_corpus,
                            run_tpu_batch)

CFG = os.path.join(REFERENCE, "yolo-fastest-1.1.cfg")
WEIGHTS = os.path.join(REFERENCE, "yolo-fastest-1.1.weights")


def stage_widths():
    """Conv-output spatial widths at the flagship 320x320 geometry, widest
    first (160/80/40/20/10 — the stage structure every PERF_NOTES analysis
    uses)."""
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.ir import LayerType

    ir = parse_cfg(CFG, 320, 320)
    ws = sorted({ir.blobs[li + 1].w for li, l in enumerate(ir.layers)
                 if l.type in (LayerType.CONV, LayerType.SHORTCUT)
                 and ir.blobs[li + 1].w > 0}, reverse=True)
    return ws


def score_config(corpus, gt_lines, env, topk):
    """Score fast mode with ``env`` merged into os.environ (fresh Net per
    geometry — run_tpu_batch rebuilds, and FFCNN_F32_STAGES is a trace env
    flag, so the override takes effect) via accuracy_report.score_lines."""
    from accuracy_report import score_lines
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        pred_lines = {}
        for geo, paths in sorted(corpus.items()):
            t_lines = run_tpu_batch(CFG, WEIGHTS, paths, mode="fast",
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
    return {"map50": rnd(s["map50"]), "wmap50": rnd(s["wmap50"]),
            "map75": rnd(s["map75"]), "wmap75": rnd(s["wmap75"]),
            "mean_iou": rnd(s["mean_matched_iou"]), "n_pred": s["n_pred"]}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images", type=int, default=0,
                    help="cap corpus size (0 = all)")
    ap.add_argument("--tier", default="wide", choices=("std", "wide"))
    ap.add_argument("--topk", type=int, default=128)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "device"))
    ap.add_argument("--stages", nargs="*", type=int, default=None,
                    help="stage widths to sweep (default: all + "
                         "baseline/all-f32/head-f32 controls)")
    ap.add_argument("--work-dir", default="/tmp/ffcnn_differential")
    ap.add_argument("-o", "--out", default=None,
                    help="append one JSON line per config (resume-friendly)")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        force_cpu_backend()
    corpus = generate_corpus(os.path.join(args.work_dir, "corpus"),
                             args.images, tier=args.tier)
    n = sum(len(v) for v in corpus.values())
    binary = build_reference("v0")
    from accuracy_report import collect_gt      # sha1-disk-cached oracle
    gt_lines = collect_gt(corpus, binary, args.work_dir)
    print(f"corpus: {n} images ({args.tier} tier); GT: reference v0",
          flush=True)

    ws = stage_widths()
    done = set()
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["label"])
                except (ValueError, KeyError):
                    pass

    results = {}

    def row(label, env):
        if label in done:
            print(f"{label:>22s}: already in {args.out}, skipped", flush=True)
            return
        r = score_config(corpus, gt_lines, env, args.topk)
        results[label] = dict(r, env=env)
        fmt = lambda v: "n/a " if v is None else f"{v:.4f}"
        print(f"{label:>22s}: wmAP@.5 {fmt(r['wmap50'])}  "
              f"mAP@.5 {fmt(r['map50'])}  wmAP@.75 {fmt(r['wmap75'])}  "
              f"meanIoU {fmt(r['mean_iou'])}  ({r['n_pred']} pred)",
              flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(dict(r, label=label, env=env)) + "\n")

    row("fast baseline", {})
    sweep = args.stages if args.stages is not None else ws
    for w in sweep:
        row(f"f32 stage w{w}", {"FFCNN_F32_STAGES": str(w)})
    if args.stages is None:
        # controls: everything-f32 (the bf16 ceiling: residual drift here is
        # decode/letterbox/precision policy, not conv storage) and head-f32
        # (the refuted r4 hypothesis, re-run under the same metric)
        row("f32 all stages", {"FFCNN_F32_STAGES":
                               ",".join(str(w) for w in ws)})
        row("head chains f32", {"FFCNN_HEAD_F32": "1"})
    print(json.dumps({"tier": args.tier, "corpus_images": n,
                      "platform": args.platform, "stage_widths": ws,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
