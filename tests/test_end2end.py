"""End-to-end golden tests: full jitted pipeline vs the C reference's output
(SURVEY.md §4c) — at the stock 320x320 input AND at the reference demo's own
640x448 geometry (ALIGN-32 input override, ffcnn.c:133-134,573), so the jit
path is gated at a non-square, non-stock size too."""
import numpy as np
import pytest

import conftest
from ffcnn_tpu import Net
from ffcnn_tpu.imageio.bmp import bmp_load


def _golden(name):
    out = []
    with open(conftest.fixture_path(name)) as f:
        for line in f:
            score = float(line.split("score:")[1].split(",")[0])
            cat = int(line.split("category:")[1].split(",")[0])
            rect = [int(v) for v in line.split("(")[1].split(")")[0].split()]
            out.append((cat, score, *rect))
    return out


@pytest.fixture(scope="module")
def net320(ref_cfg, ref_weights):
    return Net.load(ref_cfg, ref_weights, mode="parity")


def test_golden_detections_320(net320):
    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    dets = net320.detect(bgr)
    golden = _golden("golden_boxes_320x320.txt")
    assert len(dets) == len(golden)
    for d, want in zip(dets, golden):
        assert d.class_id == want[0]
        assert abs(d.score - want[1]) < 5e-3
        assert (int(d.x1), int(d.y1), int(d.x2), int(d.y2)) == want[2:]


def test_golden_detections_640x448_demo_geometry(ref_cfg, ref_weights,
                                                 ref_bmp):
    """The reference demo's exact run (./ffcnn 1 test.bmp cfg weights):
    640x448 image, input dims overridden to ALIGN(640,32)xALIGN(448,32) =
    640x448, through the full jitted pipeline in parity mode."""
    net = Net.load(ref_cfg, ref_weights, 640, 448, mode="parity")
    dets = net.detect(bmp_load(ref_bmp))
    golden = _golden("golden_boxes_640x448.txt")
    assert len(dets) == len(golden)
    for d, want in zip(dets, golden):
        assert d.class_id == want[0]
        assert abs(d.score - want[1]) < 5e-3
        assert (int(d.x1), int(d.y1), int(d.x2), int(d.y2)) == want[2:]


def test_batch_consistency(net320):
    """Batched detect must equal per-image detect."""
    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    flipped = bgr[:, ::-1].copy()
    batch_dets = net320.detect(np.stack([bgr, flipped]))
    single0 = net320.detect(bgr)
    single1 = net320.detect(flipped)
    assert [(d.class_id, round(d.score, 5)) for d in batch_dets[0]] == \
           [(d.class_id, round(d.score, 5)) for d in single0]
    assert [(d.class_id, round(d.score, 5)) for d in batch_dets[1]] == \
           [(d.class_id, round(d.score, 5)) for d in single1]


def test_dump_matches_reference_format(net320):
    text = net320.dump()
    assert text.startswith("layer   type  filters")
    assert "yolo class_num: 80" in text


def test_fast_mode_golden_classes(ref_cfg, ref_weights):
    """The production path (bf16 + folded-conv1 uint8 preprocess) must find
    the same objects as the C reference on the golden image — classes exact,
    boxes within bf16 wiggle (the reference's mAP-parity criterion is for
    parity mode; fast mode trades bit-parity for throughput)."""
    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    net = Net.load(ref_cfg, ref_weights, mode="fast")
    dets = net.detect(bgr)
    golden = _golden("golden_boxes_320x320.txt")
    assert len(dets) == len(golden)
    for d, (cat, score, x1, y1, x2, y2) in zip(dets, golden):
        assert d.class_id == cat
        assert abs(d.score - score) < 0.05
        for got, want in ((d.x1, x1), (d.y1, y1), (d.x2, x2), (d.y2, y2)):
            assert abs(got - want) < 12, (d, (cat, score, x1, y1, x2, y2))
