"""FFCNN_F32_STAGES — the per-stage bf16-drift bisection knob (VERDICT r4
#2; tools/bisect_f32stage.py).  Forcing one spatial stage to f32 must be
stage-LOCAL (downstream layers resume bf16), must improve-or-match the plain
bf16 pipeline's agreement with parity mode, and must not disturb the golden
detections."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ffcnn_tpu import Net
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.imageio.bmp import bmp_load

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"


def _stage_set(ir, widths):
    return {li for li, l in enumerate(ir.layers)
            if ir.blobs[li + 1].w in widths
            and l.type in (LayerType.CONV, LayerType.SHORTCUT)}


def test_stage_set_structure():
    """Every flagship stage width yields a non-empty conv/shortcut set, and
    the sets partition the conv/shortcut layers."""
    ir = parse_cfg(CFG, 320, 320)
    widths = sorted({ir.blobs[li + 1].w for li, l in enumerate(ir.layers)
                     if l.type in (LayerType.CONV, LayerType.SHORTCUT)},
                    reverse=True)
    assert widths == [160, 80, 40, 20, 10]
    sets = {w: _stage_set(ir, {w}) for w in widths}
    assert all(sets[w] for w in widths)
    union = set().union(*sets.values())
    eligible = {li for li, l in enumerate(ir.layers)
                if l.type in (LayerType.CONV, LayerType.SHORTCUT)}
    assert union == eligible
    assert sum(len(s) for s in sets.values()) == len(eligible)


def test_stage_local_dtype(monkeypatch):
    """Forcing the w40 stage stores its blobs f32 but hands bf16 back to
    the w20 stage: the raw yolo heads (w20/w10 chains) stay bf16."""
    from ffcnn_tpu.graph.build import forward_features

    ir = parse_cfg(CFG, 320, 320)
    net = Net.load(CFG, WEIGHTS, mode="fast")
    x = jnp.zeros((1, 320, 320, 3), jnp.uint8)
    f32set = frozenset(_stage_set(ir, {40}))
    heads = forward_features(ir, net.params, x, input_dtype=jnp.bfloat16,
                             f32_layers=f32set)
    assert all(h.dtype == jnp.bfloat16 for h in heads)
    # forcing the head stages instead makes the heads f32
    f32set = frozenset(_stage_set(ir, {20, 10}))
    heads = forward_features(ir, net.params, x, input_dtype=jnp.bfloat16,
                             f32_layers=f32set)
    assert all(h.dtype == jnp.float32 for h in heads)


@pytest.mark.parametrize("stages", ["40", "160,80,40,20,10"])
def test_forced_stage_keeps_golden(monkeypatch, stages):
    """Golden detections survive any stage forcing (fast mode already finds
    the golden objects on the fixture; f32 can only reduce rounding)."""
    monkeypatch.setenv("FFCNN_F32_STAGES", stages)
    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    net = Net.load(CFG, WEIGHTS, mode="fast")
    dets = net.detect(bgr)
    golden = []
    with open(conftest.fixture_path("golden_boxes_320x320.txt")) as f:
        for line in f:
            golden.append(int(line.split("category:")[1].split(",")[0]))
    assert [d.class_id for d in dets] == golden


def test_all_stages_f32_tightens_parity_gap(monkeypatch):
    """With EVERY stage forced, the fast pipeline's raw head activations
    must sit closer to parity mode's than plain bf16 does — the control row
    of the bisection sweep."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (1, 320, 320, 3), np.uint8)

    def heads_for(stages):
        if stages is None:
            os.environ.pop("FFCNN_F32_STAGES", None)
        else:
            os.environ["FFCNN_F32_STAGES"] = stages
        try:
            net = Net.load(CFG, WEIGHTS, mode="fast")
            res = net.detect_device(img)
            return np.asarray(res.scores, np.float32)
        finally:
            os.environ.pop("FFCNN_F32_STAGES", None)

    parity = np.asarray(
        Net.load(CFG, WEIGHTS, mode="parity").detect_device(
            img.astype(np.uint8)).scores, np.float32)
    plain = heads_for(None)
    forced = heads_for("160,80,40,20,10")
    err_plain = float(np.abs(np.sort(plain) - np.sort(parity)).max())
    err_forced = float(np.abs(np.sort(forced) - np.sort(parity)).max())
    assert err_forced <= err_plain + 1e-6, (err_forced, err_plain)
