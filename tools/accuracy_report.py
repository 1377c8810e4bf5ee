#!/usr/bin/env python
"""Detection-set accuracy metric vs the living C reference (mAP-style).

The reference's published accuracy oracle was an mAP-style comparison
against ncnn (/root/reference/readme.txt:111-131).  This tool is the
analog for the TPU framework: the C binary's detections over the
differential corpus are the ground truth, and each pipeline mode is
scored with VOC-style average precision (score-ranked, greedy IoU
matching, all-point interpolation) at IoU 0.5 and 0.75, plus the mean
IoU of the matched pairs.  Where tools/c_differential.py answers "does
every box line match?", this answers "how good is the detection SET" in
the metric the detection literature (and the reference's readme) uses.

IoU here is the standard intersection-over-UNION of the metric
definition — deliberately not the reference's min-area NMS quirk
(ffcnn.c:316-317), which is an internal suppression rule, not a scoring
rule.

    /opt/venv/bin/python tools/accuracy_report.py --modes parity fast
    # one JSON line at the end: {"map50": {...}, "map75": {...}, ...}
"""
import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c_differential import (REFERENCE, _parse_line, build_reference,  # noqa: E402
                            force_cpu_backend, generate_corpus, run_c,
                            run_tpu_batch)

CFG = os.path.join(REFERENCE, "yolo-fastest-1.1.cfg")
WEIGHTS = os.path.join(REFERENCE, "yolo-fastest-1.1.weights")


def _iou(a, b):
    """Standard IoU of two (x1, y1, x2, y2) boxes (inclusive pixel rects,
    matching the demo's printed integer coords)."""
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
    inter = ix * iy
    area = lambda r: (r[2] - r[0] + 1) * (r[3] - r[1] + 1)
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def average_precision(preds, gts, iou_thr):
    """VOC all-point-interpolated AP for ONE class.

    ``preds``: [(image_id, score, box)], ``gts``: {image_id: [box, ...]}.
    Greedy: predictions sorted by score; each consumes at most one GT."""
    n_gt = sum(len(v) for v in gts.values())
    if n_gt == 0:
        return None
    used = {img: np.zeros(len(v), bool) for img, v in gts.items()}
    tp = []
    for img, _, box in sorted(preds, key=lambda p: -p[1]):
        cand = gts.get(img, [])
        best, best_iou = -1, iou_thr
        for gi, g in enumerate(cand):
            if used[img][gi]:
                continue
            v = _iou(box, g)
            if v >= best_iou:
                best, best_iou = gi, v
        if best >= 0:
            used[img][best] = True
            tp.append(1.0)
        else:
            tp.append(0.0)
    if not tp:
        return 0.0
    tp = np.asarray(tp)
    cum_tp = np.cumsum(tp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.arange(1, len(tp) + 1)
    # all-point interpolation: precision envelope, integrate over recall
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap, prev_r = 0.0, 0.0
    for r, p in zip(recall, precision):
        ap += (r - prev_r) * p
        prev_r = r
    return float(ap)


def weighted_map(ap_by_class, per_class):
    """GT-count-weighted mean AP.  Macro mAP gives a 2-box class the
    same vote as a 60-box one, so on a small corpus a single knife-edge
    box flip dominates the ranking; the weighted flavor is what
    actually resolves near-tied schemes."""
    pairs = [(v, per_class[c]["n_gt"]) for c, v in ap_by_class.items()
             if v is not None and per_class[c]["n_gt"] > 0]
    if not pairs:
        return None
    return float(sum(v * n for v, n in pairs) / sum(n for _, n in pairs))


def collect_gt(corpus, binary, work_dir):
    """Run the C oracle once per image; returns {path: [box lines]}.

    Disk-cached by (binary variant dir, cfg+weights content hash, bmp
    content sha1) in ``work_dir`` — the corpus is deterministic and the C
    binary is the pinned oracle, so GT never needs recomputing across
    modes, calib schemes, or sessions (conv-v0 at 640x448 is the slow leg
    here).  The model hash in the filename keeps a future CFG/WEIGHTS
    change from silently serving stale ground truth (ADVICE r4)."""
    import hashlib
    variant = os.path.basename(os.path.dirname(binary))
    mh = hashlib.sha1()
    for path in (CFG, WEIGHTS):
        with open(path, "rb") as f:
            mh.update(f.read())
    cache_path = os.path.join(work_dir,
                              f"gt_{variant}_{mh.hexdigest()[:10]}.json")
    cache = {}
    if os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except ValueError:
            cache = {}
    gt, dirty = {}, False
    for geo, paths in sorted(corpus.items()):
        for p in paths:
            with open(p, "rb") as f:
                key = hashlib.sha1(f.read()).hexdigest()
            if key not in cache:
                cache[key] = run_c(binary, p, CFG, WEIGHTS)
                dirty = True
            gt[p] = cache[key]
    if dirty:
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, cache_path)
    return gt


def score_lines(corpus, gt_lines, pred_lines):
    """The scoring core shared by this report and the int8 attribution
    sweep (tools/int8_attribution.py): VOC AP at 0.5/0.75 + matched-pair
    IoU over already-collected box lines (both ``{path: [box lines]}``).
    One implementation so the two harnesses cannot drift."""
    preds = defaultdict(list)          # class -> [(img, score, box)]
    gts = defaultdict(lambda: defaultdict(list))   # class -> img -> [box]
    ious = []
    img_id = 0
    for geo, paths in sorted(corpus.items()):
        for p in paths:
            for ln in gt_lines[p]:
                c, s, *box = _parse_line(ln)
                gts[c][img_id].append(tuple(box))
            for ln in pred_lines[p]:
                c, s, *box = _parse_line(ln)
                preds[c].append((img_id, s, tuple(box)))
            img_id += 1
    ap50, ap75, per_class = {}, {}, {}
    for c in sorted(set(gts) | set(preds)):
        g = gts.get(c, {})
        ap50[c] = average_precision(preds.get(c, []), g, 0.5)
        ap75[c] = average_precision(preds.get(c, []), g, 0.75)
        per_class[c] = {"ap50": ap50[c], "ap75": ap75[c],
                        "n_gt": sum(len(v) for v in g.values()),
                        "n_pred": len(preds.get(c, []))}
        # matched-pair IoU at 0.5 for the drift flavor of the table
        used = {img: np.zeros(len(v), bool) for img, v in g.items()}
        for img, _, box in sorted(preds.get(c, []), key=lambda p: -p[1]):
            best, best_iou = -1, 0.5
            for gi, gb in enumerate(g.get(img, [])):
                if used[img][gi]:
                    continue
                v = _iou(box, gb)
                if v >= best_iou:
                    best, best_iou = gi, v
            if best >= 0:
                used[img][best] = True
                ious.append(best_iou)
    vals50 = [v for v in ap50.values() if v is not None]
    vals75 = [v for v in ap75.values() if v is not None]
    return {"map50": float(np.mean(vals50)) if vals50 else None,
            "map75": float(np.mean(vals75)) if vals75 else None,
            "wmap50": weighted_map(ap50, per_class),
            "wmap75": weighted_map(ap75, per_class),
            "mean_matched_iou": float(np.mean(ious)) if ious else None,
            "n_pred": sum(len(v) for v in preds.values()),
            "n_gt": sum(len(v) for vv in gts.values()
                        for v in vv.values()),
            "per_class": per_class}


def score_mode(corpus, gt_lines, mode, topk, calib="self"):
    """(map50, map75, mean_matched_iou, n_pred, n_gt, per_class) for one
    pipeline mode over the whole corpus, C output as ground truth
    (``gt_lines``: {path: [box lines]} from collect_gt)."""
    pred_lines = {}
    for geo, paths in sorted(corpus.items()):
        t_lines = run_tpu_batch(CFG, WEIGHTS, paths, mode=mode, topk=topk,
                                calib=calib)
        pred_lines.update(zip(paths, t_lines))
    return score_lines(corpus, gt_lines, pred_lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--modes", nargs="*",
                    default=["parity", "fast"],
                    choices=("parity", "fast", "int8"))
    ap.add_argument("--images", type=int, default=0,
                    help="cap corpus size (0 = all)")
    ap.add_argument("--variant", default="v0",
                    help="reference build used as ground truth (v0 = the "
                         "reference's own correctness oracle)")
    ap.add_argument("--platform", default="cpu", choices=("cpu", "device"))
    ap.add_argument("--topk", type=int, default=128)
    ap.add_argument("--calib", default="self", choices=("self", "corpus"),
                    help="int8 calibration: the pipeline's 8-frame "
                         "self-calibration, or explicit calibrate() on "
                         "the whole corpus (production recommendation)")
    ap.add_argument("--tier", default="std", choices=("std", "wide"),
                    help="corpus tier: std (48 images) or wide (~110 — "
                         "enough GT boxes that mAP resolves near-tied "
                         "schemes)")
    ap.add_argument("--work-dir", default="/tmp/ffcnn_differential")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        force_cpu_backend()
    corpus = generate_corpus(os.path.join(args.work_dir, "corpus"),
                             args.images, tier=args.tier)
    n = sum(len(v) for v in corpus.values())
    binary = build_reference(args.variant)
    print(f"corpus: {n} images; ground truth: reference {args.variant}")
    gt_lines = collect_gt(corpus, binary, args.work_dir)
    summary = {"corpus_images": n, "gt_variant": args.variant,
               "platform": args.platform, "tier": args.tier}
    for mode in args.modes:
        r = score_mode(corpus, gt_lines, mode, args.topk, calib=args.calib)
        summary[mode] = {k: r[k] for k in
                         ("map50", "map75", "wmap50", "wmap75",
                          "mean_matched_iou", "n_pred", "n_gt")}
        fmt = lambda v: "n/a" if v is None else f"{v:.4f}"
        print(f"{mode:>7s}: mAP@0.5 {fmt(r['map50'])}  "
              f"mAP@0.75 {fmt(r['map75'])}  "
              f"wmAP@0.5 {fmt(r['wmap50'])}  "
              f"wmAP@0.75 {fmt(r['wmap75'])}  "
              f"mean-IoU {fmt(r['mean_matched_iou'])}  "
              f"({r['n_pred']} pred / {r['n_gt']} gt)")
        for c, pc in sorted(r["per_class"].items()):
            print(f"         class {c:3d}: ap50 {fmt(pc['ap50'])} "
                  f"ap75 {fmt(pc['ap75'])} "
                  f"({pc['n_pred']} pred / {pc['n_gt']} gt)")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
