"""NumPy oracle end-to-end vs the reference binary's golden detections."""
import numpy as np

import conftest
from ffcnn_tpu.darknet import parse_cfg, load_weights
from ffcnn_tpu.imageio.bmp import bmp_load, bmp_save
from ffcnn_tpu.oracle import numpy_ref as oracle


def _golden_boxes():
    out = []
    with open(conftest.fixture_path("golden_boxes_640x448.txt")) as f:
        for line in f:
            # "score: 1.00, category:  0, rect: (188  96 273 365)"
            score = float(line.split("score:")[1].split(",")[0])
            cat = int(line.split("category:")[1].split(",")[0])
            rect = [int(v) for v in
                    line.split("(")[1].split(")")[0].split()]
            out.append((cat, score, *rect))
    return out


def test_oracle_golden_detections(ref_cfg, ref_weights, ref_bmp):
    bgr = bmp_load(ref_bmp)
    ir = parse_cfg(ref_cfg, bgr.shape[1], bgr.shape[0])
    params, _ = load_weights(ir, ref_weights)
    boxes = oracle.detect(ir, params, bgr)
    golden = _golden_boxes()
    assert len(boxes) == len(golden)
    for got, want in zip(boxes, golden):
        assert got[0] == want[0]                       # class
        assert abs(got[1] - want[1]) < 5e-3            # printed score (2dp)
        for a, b in zip(got[2:], want[2:]):            # int-cast coords
            assert int(a) == b


def test_bmp_roundtrip(ref_bmp, tmp_path):
    img = bmp_load(ref_bmp)
    assert img.shape == (424, 640, 3)
    p = str(tmp_path / "rt.bmp")
    bmp_save(p, img)
    again = bmp_load(p)
    assert np.array_equal(img, again)


def test_letterbox_quirks():
    """Integer scale math and top-left anchoring (ffcnn.c:267-283)."""
    bgr = np.zeros((10, 20, 3), np.uint8)
    bgr[0, 0] = (1, 2, 3)  # B,G,R
    out, s1, s2 = oracle.letterbox(bgr, 32, 32, (0, 0, 0), (1, 1, 1))
    # w*net_h > h*net_w: 20*32 > 10*32 → sw=32, sh=32*10//20=16, s1=20, s2=32
    assert (s1, s2) == (20, 32)
    assert out.shape == (32, 32, 3)
    # BGR→RGB: channel 0 is R
    assert tuple(out[0, 0]) == (3.0, 2.0, 1.0)
    # bottom rows are zero padding
    assert np.all(out[16:] == 0)
