"""Pipelined dispatch: detect_async / detect_stream keep up to ``depth``
batches in flight so host->HBM transfer and host-side result decode overlap
device compute.  The reference's demo loop is strictly serial
(ffcnn.c:577-580); these tests pin that the overlapped paths are
result-identical to the serial one.
"""

import os

import numpy as np
import pytest

from ffcnn_tpu import Net
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture(scope="module")
def net():
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    return Net(ir, params, mode="parity")


def _batches(n_batches, n, seed=1):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (n, 64, 64, 3), dtype=np.uint8)
            for _ in range(n_batches)]


def _assert_same(got, want):
    assert len(got) == len(want)
    for g_img, w_img in zip(got, want):
        assert len(g_img) == len(w_img)
        for g, w in zip(g_img, w_img):
            assert g.class_id == w.class_id
            assert abs(g.score - w.score) < 1e-6
            assert max(abs(a - b) for a, b in
                       zip((g.x1, g.y1, g.x2, g.y2),
                           (w.x1, w.y1, w.x2, w.y2))) < 1e-4


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_detect_stream_matches_detect(net, depth):
    batches = _batches(4, 3)
    want = [net.detect(b) for b in batches]
    got = list(net.detect_stream(iter(batches), depth=depth))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        _assert_same(g, w)


def test_detect_stream_more_batches_than_depth(net):
    """In-flight order is preserved when the stream is long."""
    batches = _batches(7, 2, seed=5)
    got = list(net.detect_stream(batches, depth=2))
    want = [net.detect(b) for b in batches]
    for g, w in zip(got, want):
        _assert_same(g, w)


def test_detect_stream_rejects_bad_shapes(net):
    with pytest.raises(ValueError):
        list(net.detect_stream([np.zeros((64, 64, 3), np.uint8)]))
    with pytest.raises(ValueError):
        net.detect_stream([], depth=0)      # raises at CALL time


def test_detect_stream_empty(net):
    assert list(net.detect_stream([])) == []


def test_detect_async_matches_detect(net):
    (batch,) = _batches(1, 4, seed=9)
    want = net.detect(batch)
    finish = net.detect_async(batch)
    _assert_same(finish(), want)


def test_dpnet_detect_async_matches_detect():
    from ffcnn_tpu.parallel import DPNet
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    dpnet = DPNet(Net(ir, params, mode="parity"))
    (batch,) = _batches(1, 8, seed=2)
    want = dpnet.detect(batch)
    got = dpnet.detect_async(batch)()
    _assert_same(got, want)


def test_dpnet_detect_stream_matches_detect():
    from ffcnn_tpu.parallel import DPNet
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7,
                                                     obj_bias=2.0))
    dpnet = DPNet(Net(ir, params, mode="parity"))
    batches = _batches(3, 8, seed=5)
    got = list(dpnet.detect_stream(batches, depth=2))
    want = [dpnet.detect(b) for b in batches]
    for g, w in zip(got, want):
        _assert_same(g, w)


def test_artifactnet_detect_stream_matches_detect(tmp_path):
    from ffcnn_tpu.export import ArtifactNet
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7,
                                                     obj_bias=2.0))
    net = Net(ir, params, mode="parity")
    p4 = str(tmp_path / "m.b4.ffx")
    net.export(p4, batch_size=4)
    art = ArtifactNet([p4])
    batches = _batches(3, 4, seed=6)
    got = list(art.detect_stream(batches, depth=2))
    want = [art.detect(b) for b in batches]
    for g, w in zip(got, want):
        _assert_same(g, w)
