"""int8 inference mode: quantization math, plan policy, and the accuracy
gate (golden objects found with classes exact, boxes within the fast-mode
tolerance).  The reference has no quantized path (pure float C); this is
the TPU-native capability VERDICT r1 item 2 calls for."""

import numpy as np
import pytest

import conftest
import jax
import jax.numpy as jnp

from ffcnn_tpu import Net
from ffcnn_tpu.imageio.bmp import bmp_load
from ffcnn_tpu.ops.conv import conv2d_int8


def test_conv2d_int8_matches_dequantized_reference():
    rng = np.random.RandomState(0)
    xq = rng.randint(-127, 128, (2, 6, 6, 16), dtype=np.int8)
    wq = rng.randint(-127, 128, (3, 3, 16, 8), dtype=np.int8)
    xs = 0.037
    ws = rng.uniform(0.001, 0.02, 8).astype(np.float32)
    bias = rng.uniform(-1, 1, 8).astype(np.float32)

    y = jax.jit(lambda a, b: conv2d_int8(
        a, b, xs, jnp.asarray(ws), jnp.asarray(bias), stride=1, pad=1,
        groups=1, act=2, out_scale=None, float_dtype=jnp.float32))(
        jnp.asarray(xq), jnp.asarray(wq))

    # reference: float conv on dequantized operands
    from ffcnn_tpu.oracle.numpy_ref import conv_forward
    from ffcnn_tpu.darknet.weights import FoldedConvParams
    wf = wq.astype(np.float32) * ws[None, None, None, :]
    p = FoldedConvParams(weights=wf, scale=np.ones(8, np.float32), bias=bias)
    for n in range(2):
        want = conv_forward(xq[n].astype(np.float32) * xs, p, 1, 1, 1, 2)
        np.testing.assert_allclose(np.asarray(y)[n], want, rtol=1e-4,
                                   atol=1e-4)


def test_requantize_roundtrip():
    rng = np.random.RandomState(1)
    xq = rng.randint(-127, 128, (1, 4, 4, 16), dtype=np.int8)
    wq = np.zeros((1, 1, 16, 16), np.int8)
    np.fill_diagonal(wq[0, 0], 64)
    ws = np.full(16, 1 / 64.0, np.float32)       # identity conv
    y = jax.jit(lambda a, b: conv2d_int8(
        a, b, 0.5, jnp.asarray(ws), jnp.zeros(16, jnp.float32), stride=1,
        pad=0, groups=1, act=0, out_scale=0.5))(jnp.asarray(xq),
                                                jnp.asarray(wq))
    np.testing.assert_array_equal(np.asarray(y), xq)   # exact roundtrip


def test_plan_policy(ref_cfg, ref_weights):
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.quant import build_plan
    from ffcnn_tpu.darknet.ir import LayerType
    from ffcnn_tpu.graph.build import params_to_pytree

    ir = parse_cfg(ref_cfg)
    params = params_to_pytree(load_weights(ir, ref_weights)[0])
    absmax = np.full(len(ir.blobs), 4.0, np.float32)
    plan = build_plan(ir, params, absmax, min_channels=16)

    for bi in plan.blob_scale:
        assert ir.blobs[bi].c >= 16                    # small-C stays float
    for l in ir.layers:
        if l.type == LayerType.YOLO:
            assert l.index not in plan.blob_scale      # head inputs float
    # maxpool outputs share their input's scale exactly (SPP layers)
    for li, l in enumerate(ir.layers):
        if l.type == LayerType.MAXPOOL and li in plan.blob_scale \
                and (li + 1) in plan.blob_scale:
            assert plan.blob_scale[li + 1] == plan.blob_scale[li]
    # every quantized conv's weights exist and are int8
    for li, q in plan.weights.items():
        assert q["wq"].dtype == jnp.int8
        assert li in plan.blob_scale
    # head convs excluded from weight quantization
    from ffcnn_tpu.darknet.ir import LayerType as _LT
    for li, l in enumerate(ir.layers):
        if l.type == _LT.YOLO:
            assert (li - 1) not in plan.weights


def test_percentile_calibration_clips_scales(ref_cfg, ref_weights):
    """FFCNN_INT8_PCT / calibrate(percentile=...): percentile-clipped
    activation scales are <= the absmax scales (and the knob actually
    changes the plan).  Default stays absmax — the percentile variant
    measured WORSE end-to-end on small calibration sets
    (docs/PERF_NOTES.md 'int8 percentile calibration')."""
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.graph.build import params_to_pytree
    from ffcnn_tpu.quant import calibrate

    ir = parse_cfg(ref_cfg, 160, 160)
    params = params_to_pytree(load_weights(ir, ref_weights)[0])
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 160, 160, 3), dtype=np.uint8)
    base = calibrate(ir, params, imgs)
    clipped = calibrate(ir, params, imgs, percentile=99.0)
    assert set(clipped.blob_scale) == set(base.blob_scale)
    assert all(clipped.blob_scale[b] <= base.blob_scale[b] + 1e-9
               for b in base.blob_scale)
    assert any(clipped.blob_scale[b] < base.blob_scale[b] * 0.999
               for b in base.blob_scale)


@pytest.mark.slow
def test_int8_golden_accuracy(ref_cfg, ref_weights):
    """int8 flagship on the golden image: same objects as the C reference,
    classes exact, boxes within the fast-mode tolerance."""
    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    net = Net.load(ref_cfg, ref_weights, mode="int8")
    net.calibrate(bgr[None])
    assert net.quant is not None and len(net.quant.weights) > 30
    dets = net.detect(bgr)

    golden = []
    with open(conftest.fixture_path("golden_boxes_320x320.txt")) as f:
        for line in f:
            score = float(line.split("score:")[1].split(",")[0])
            cat = int(line.split("category:")[1].split(",")[0])
            rect = [int(v) for v in line.split("(")[1].split(")")[0].split()]
            golden.append((cat, score, *rect))
    assert len(dets) == len(golden)
    for d, (cat, score, x1, y1, x2, y2) in zip(dets, golden):
        assert d.class_id == cat
        assert abs(d.score - score) < 0.05
        for got, want in ((d.x1, x1), (d.y1, y1), (d.x2, x2), (d.y2, y2)):
            assert abs(got - want) < 12, (d, (cat, score, x1, y1, x2, y2))


def test_quant_plan_save_load_roundtrip(tmp_path, ref_cfg, ref_weights):
    """Calibration persists: a saved+reloaded plan produces identical
    detections (serving restarts skip recalibration)."""
    from ffcnn_tpu.quant import load_plan, save_plan

    bgr = bmp_load(conftest.fixture_path("test320.bmp"))
    net = Net.load(ref_cfg, ref_weights, mode="int8")
    net.calibrate(bgr[None])
    want = net.detect(bgr)

    p = str(tmp_path / "plan.npz")
    save_plan(p, net.quant)
    plan = load_plan(p)
    assert plan.blob_scale == net.quant.blob_scale
    assert plan.min_channels == net.quant.min_channels

    net2 = Net.load(ref_cfg, ref_weights, mode="int8")
    net2.set_quant_plan(plan)
    got = net2.detect(bgr)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.class_id == b.class_id
        assert abs(a.score - b.score) < 1e-6


def test_mixed_storage_pool_reconciles():
    """A plan where a maxpool's input is int8 but its output blob is
    excluded (possible in non-flagship graphs) must dequantize at the
    boundary instead of leaking raw int8 values into the float path."""
    import os
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
    from ffcnn_tpu.graph.build import forward_features, params_to_pytree
    from ffcnn_tpu.quant import build_plan, collect_blob_absmax

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ir = parse_cfg(os.path.join(REPO, "models", "ffcnn-micro.cfg"), 64, 64)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=2, obj_bias=0.0))[0])
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, 64, 64, 3), np.uint8)
    absmax = collect_blob_absmax(ir, params, img, (0.,) * 3, (1 / 255.,) * 3)

    from ffcnn_tpu.darknet.ir import LayerType
    pool_li = next(li for li, l in enumerate(ir.layers)
                   if l.type == LayerType.MAXPOOL and ir.blobs[li].c >= 16)
    plan = build_plan(ir, params, absmax, min_channels=16,
                      exclude_blobs={pool_li + 1})
    assert plan.blob_is_int8(pool_li) and not plan.blob_is_int8(pool_li + 1)

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    ref = forward_features(ir, params, x)
    got = forward_features(ir, params, x, quant=plan)
    for a, b in zip(ref, got):
        # int8 tolerance: coarse but bounded — a raw-int8 leak would be
        # off by ~1/scale (orders of magnitude)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0.25, atol=0.15)


def _micro_setup(min_channels=8, per_channel=False):
    import os
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
    from ffcnn_tpu.graph.build import params_to_pytree
    from ffcnn_tpu.quant import build_plan, collect_blob_absmax

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ir = parse_cfg(os.path.join(REPO, "models", "ffcnn-micro.cfg"), 64, 64)
    params = params_to_pytree(load_weights(
        ir, synth_weights_bytes(ir, seed=3, obj_bias=0.0))[0])
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
    absmax = collect_blob_absmax(ir, params, img, (0.,) * 3, (1 / 255.,) * 3,
                                 per_channel=per_channel)
    plan = build_plan(ir, params, absmax, min_channels=min_channels)
    return ir, params, plan


def test_per_channel_plan_shapes_and_policy():
    """Per-channel plans carry (C,) scale vectors, pre-fold the input
    scales into the weights (xs=1), and keep the per-tensor policy
    (small-C exclusion, head floats, pass-through scale tying)."""
    ir, params, plan = _micro_setup(per_channel=True)
    assert plan.per_channel
    assert plan.blob_scale, "plan quantized nothing"
    for bi, s in plan.blob_scale.items():
        assert s.shape == (ir.blobs[bi].c,), bi
        assert (s > 0).all()
        assert plan.scalar_scale(bi) is None      # fused kernels fall back
    for li, q in plan.weights.items():
        assert q["xs"] == 1.0
        assert q["wq"].dtype == jnp.int8
    # pass-through producers (maxpool/upsample/dropout) tie vectors exactly
    from ffcnn_tpu.darknet.ir import LayerType
    for li, l in enumerate(ir.layers):
        if l.type in (LayerType.MAXPOOL, LayerType.UPSAMPLE,
                      LayerType.DROPOUT) and li in plan.blob_scale \
                and (li + 1) in plan.blob_scale:
            np.testing.assert_array_equal(plan.blob_scale[li + 1],
                                          plan.blob_scale[li])
    # route outputs: the calibrated vector is the exact concat of the
    # parts' vectors (route copies channels), so int8 passthrough is exact
    for li, l in enumerate(ir.layers):
        if l.type == LayerType.ROUTE and l.route_groups == 1 \
                and (li + 1) in plan.blob_scale:
            off = 0
            for d in l.depends:
                bi = d + 1
                c = ir.blobs[bi].c
                if bi in plan.blob_scale:
                    np.testing.assert_array_equal(
                        plan.blob_scale[li + 1][off:off + c],
                        plan.blob_scale[bi])
                off += c


def test_per_channel_forward_at_least_as_accurate():
    """End-to-end on the micro net (dense+depthwise convs, SPP pools,
    route groups, shortcut): the per-channel int8 forward stays within the
    mixed-plan tolerance of the float reference AND its head error does
    not exceed the per-tensor plan's (deterministic: fixed seeds)."""
    from ffcnn_tpu.graph.build import forward_features

    ir, params, plan_pt = _micro_setup(per_channel=False)
    _, _, plan_pc = _micro_setup(per_channel=True)
    assert set(plan_pc.blob_scale) == set(plan_pt.blob_scale)
    assert set(plan_pc.weights) == set(plan_pt.weights)

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = forward_features(ir, params, x)
    got_pt = forward_features(ir, params, x, quant=plan_pt)
    got_pc = forward_features(ir, params, x, quant=plan_pc)
    err_pt = err_pc = 0.0
    for r, a, b in zip(ref, got_pt, got_pc):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(b), r, rtol=0.25, atol=0.15)
        err_pt += float(np.mean(np.abs(np.asarray(a) - r)))
        err_pc += float(np.mean(np.abs(np.asarray(b) - r)))
    assert err_pc <= err_pt * 1.02, (err_pc, err_pt)


def test_per_channel_save_load_roundtrip(tmp_path):
    from ffcnn_tpu.quant import load_plan, save_plan

    _, _, plan = _micro_setup(per_channel=True)
    p = str(tmp_path / "plan_pc.npz")
    save_plan(p, plan)
    got = load_plan(p)
    assert got.per_channel and got.min_channels == plan.min_channels
    assert set(got.blob_scale) == set(plan.blob_scale)
    for bi in plan.blob_scale:
        np.testing.assert_array_equal(got.blob_scale[bi],
                                      plan.blob_scale[bi])
    for li in plan.weights:
        assert got.weights[li]["xs"] == 1.0
        np.testing.assert_array_equal(np.asarray(got.weights[li]["wq"]),
                                      np.asarray(plan.weights[li]["wq"]))


def test_fused_env_kill_switch(monkeypatch):
    from ffcnn_tpu.kernels.block_fused import runs_usable
    monkeypatch.setenv("FFCNN_FUSED", "0")
    assert not runs_usable(256, backend="tpu")
    monkeypatch.setenv("FFCNN_FUSED", "1")
    assert runs_usable(256, backend="tpu")


def test_attribution_blob_knobs(ref_cfg, ref_weights, monkeypatch):
    """FFCNN_INT8_ONLY_BLOBS / FFCNN_INT8_EXCLUDE_BLOBS restrict the plan's
    blob set (the per-blob accuracy-attribution harness,
    tools/int8_attribution.py)."""
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights
    from ffcnn_tpu.graph.build import params_to_pytree
    from ffcnn_tpu.quant import _int8_blobs, calibrate

    ir = parse_cfg(ref_cfg)
    params = params_to_pytree(load_weights(ir, ref_weights)[0])
    img = np.random.RandomState(0).randint(
        0, 256, (1, ir.blobs[0].h, ir.blobs[0].w, 3), dtype=np.uint8)
    eligible = _int8_blobs(ir, 32)
    keep = {eligible[0], eligible[3]}

    monkeypatch.setenv("FFCNN_INT8_ONLY_BLOBS",
                       ",".join(map(str, sorted(keep))))
    plan = calibrate(ir, params, img, min_channels=32)
    assert set(plan.blob_scale) == keep

    monkeypatch.delenv("FFCNN_INT8_ONLY_BLOBS")
    monkeypatch.setenv("FFCNN_INT8_EXCLUDE_BLOBS", str(eligible[0]))
    plan = calibrate(ir, params, img, min_channels=32)
    assert eligible[0] not in plan.blob_scale
    assert set(plan.blob_scale) == set(eligible) - {eligible[0]}
