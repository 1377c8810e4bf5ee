"""Unit tests for the mAP machinery in tools/accuracy_report.py (the
C-binary-as-ground-truth detection-set metric; the reference's published
accuracy oracle was an mAP-style ncnn comparison, readme.txt:111-131)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from accuracy_report import (_iou, average_precision,  # noqa: E402
                             weighted_map)


def test_iou_identity_and_disjoint():
    b = (10, 10, 19, 19)
    assert _iou(b, b) == 1.0
    assert _iou(b, (100, 100, 109, 109)) == 0.0


def test_iou_half_overlap():
    # two 10x10 boxes sharing a 5x10 strip: inter 50, union 150
    a, b = (0, 0, 9, 9), (5, 0, 14, 9)
    assert _iou(a, b) == pytest.approx(50 / 150)


def test_ap_perfect():
    gts = {0: [(0, 0, 9, 9)], 1: [(5, 5, 14, 14)]}
    preds = [(0, 0.9, (0, 0, 9, 9)), (1, 0.8, (5, 5, 14, 14))]
    assert average_precision(preds, gts, 0.5) == pytest.approx(1.0)


def test_ap_no_predictions_is_zero():
    assert average_precision([], {0: [(0, 0, 9, 9)]}, 0.5) == 0.0


def test_ap_no_ground_truth_is_none():
    assert average_precision([(0, 0.9, (0, 0, 9, 9))], {}, 0.5) is None


def test_ap_false_positive_ranked_first():
    """A high-scored FP before one TP: precision at the TP is 1/2, recall
    reaches 1.0 -> all-point-interpolated AP = 0.5."""
    gts = {0: [(0, 0, 9, 9)]}
    preds = [(0, 0.9, (50, 50, 59, 59)),     # FP
             (0, 0.8, (0, 0, 9, 9))]         # TP
    assert average_precision(preds, gts, 0.5) == pytest.approx(0.5)


def test_ap_missed_gt_caps_recall():
    """One of two GTs found: AP = 0.5 (perfect precision, recall 0.5)."""
    gts = {0: [(0, 0, 9, 9), (100, 100, 109, 109)]}
    preds = [(0, 0.9, (0, 0, 9, 9))]
    assert average_precision(preds, gts, 0.5) == pytest.approx(0.5)


def test_ap_each_gt_matched_once():
    """Duplicate predictions on one GT: the second is a FP."""
    gts = {0: [(0, 0, 9, 9)]}
    preds = [(0, 0.9, (0, 0, 9, 9)), (0, 0.8, (0, 0, 9, 9))]
    # TP then FP: precision envelope keeps AP at 1.0 recall with p=1.0
    assert average_precision(preds, gts, 0.5) == pytest.approx(1.0)


def test_ap_iou_threshold_gates_match():
    gts = {0: [(0, 0, 9, 9)]}
    shifted = [(0, 0.9, (5, 0, 14, 9))]      # IoU 1/3
    assert average_precision(shifted, gts, 0.5) == 0.0
    assert average_precision(shifted, gts, 0.3) == pytest.approx(1.0)


def test_weighted_map_by_gt_count():
    """A 2-box class at AP 0.5 must not outvote a 60-box class at 1.0:
    macro mean would say 0.75; weighted says (60*1.0 + 2*0.5)/62."""
    ap = {0: 1.0, 19: 0.5}
    per_class = {0: {"n_gt": 60}, 19: {"n_gt": 2}}
    assert weighted_map(ap, per_class) == pytest.approx(61 / 62)


def test_weighted_map_skips_none_and_empty():
    ap = {0: 1.0, 1: None, 2: 0.0}
    per_class = {0: {"n_gt": 10}, 1: {"n_gt": 0}, 2: {"n_gt": 0}}
    assert weighted_map(ap, per_class) == pytest.approx(1.0)
    assert weighted_map({}, {}) is None
