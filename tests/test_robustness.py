"""Failure-detection behavior (SURVEY §5): unlike the reference's
printf-and-continue (runs with zero weights on a missing file,
ffcnn.c:213-238), the TPU build validates loudly at load time."""

import os

import numpy as np
import pytest

from ffcnn_tpu import Net
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import (load_weights, synth_weights_bytes,
                                       zero_weights)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


def test_truncated_weights_raises():
    ir = parse_cfg(MICRO)
    blob = synth_weights_bytes(ir, seed=1)
    with pytest.raises(ValueError, match="floats but the graph needs"):
        load_weights(ir, blob[:-64])
    with pytest.raises(ValueError, match="too short"):
        load_weights(ir, blob[:10])


def test_allow_mismatch_tolerates_extra_floats():
    ir = parse_cfg(MICRO)
    blob = synth_weights_bytes(ir, seed=1)
    params, _ = load_weights(ir, blob + b"\x00" * 40, allow_mismatch=True)
    exact, _ = load_weights(ir, blob)
    np.testing.assert_array_equal(params[0].weights, exact[0].weights)


def test_missing_weights_requires_optin(tmp_path):
    with pytest.raises(ValueError, match="weights_path required"):
        Net.load(MICRO)
    net = Net.load(MICRO, allow_missing_weights=True)
    # zero weights -> forward runs, no detections (like the reference's
    # zero-weight fallback, just explicit)
    dets = net.detect(np.zeros((64, 64, 3), np.uint8))
    assert dets == []


def test_zero_weights_match_reference_semantics():
    ir = parse_cfg(MICRO)
    z = zero_weights(ir)
    for p in z.values():
        assert (p.scale == 1.0).all() and (p.weights == 0).all()


def test_bad_image_shape_raises():
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=1))
    net = Net(ir, params)
    with pytest.raises(ValueError, match="expected"):
        net.detect(np.zeros((64, 64), np.uint8))          # no channel dim
    with pytest.raises(ValueError, match="expected"):
        net.detect(np.zeros((2, 64, 64, 4), np.uint8))    # 4 channels


def test_unknown_cfg_sections_skipped():
    """[cost]/[region]/garbage sections are ignored exactly like the
    reference's got_layer=0 fallthrough (ffcnn.c:205)."""
    cfg = """
[net]
width=32
height=32
channels=3

[cost]
type=sse

[convolutional]
batch_normalize=1
filters=4
size=3
stride=1
pad=1
activation=leaky

[region]
whatever=1
"""
    ir = parse_cfg(cfg, is_path=False)
    assert len(ir.layers) == 1
    assert ir.blobs[1].c == 4


def test_bad_mode_rejected():
    ir = parse_cfg(MICRO)
    with pytest.raises(ValueError, match="mode"):
        Net(ir, zero_weights(ir), mode="turbo")
