"""YOLOv8 ingest (BASELINE configs[4]; ffcnn_tpu/yolov8.py): anchor-free
DFL head, graph lowering onto the darknet dialect, converter weight
packing, and the torch differential.

The reference framework has no anchor-free model; correctness anchors are
(a) the torch nn reference (tools/torch_yolov8_ref.py) — an independent
compute stack that strict-loads the same state dict — and (b) the NumPy
oracle (oracle/numpy_ref.yolov8_decode), the repo's semantic source of
truth for every op."""
import os
import sys

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU backend)
from ffcnn_tpu import yolov8
from ffcnn_tpu.darknet.cfg import dump, parse_cfg
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.darknet.weights import load_weights
from ffcnn_tpu.net import Net
from ffcnn_tpu.oracle import numpy_ref

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

NC, SCALE, SIZE = 80, "n", 320


@pytest.fixture(scope="module")
def sd():
    return yolov8.synthesize_state_dict(NC, SCALE, seed=0)


@pytest.fixture(scope="module")
def graph(sd):
    cfg, wbytes = yolov8.convert(sd, NC, SCALE, size=SIZE, conf=0.10)
    ir = parse_cfg(cfg, is_path=False)
    params, _ = load_weights(ir, wbytes)
    return ir, params


def test_graph_structure(graph):
    """Head scales sit at strides 8/16/32; exactly 3 [yolov8] heads; every
    conv's weight count is served by the packed stream (load_weights
    validated the float census already — that is the structural contract)."""
    ir, _ = graph
    heads = [(li, l) for li, l in enumerate(ir.layers)
             if l.type == LayerType.YOLOV8]
    assert len(heads) == 3
    assert [l.stride for _, l in heads] == [8, 16, 32]
    assert [ir.blobs[li].w for li, _ in heads] == [SIZE // 8, SIZE // 16,
                                                   SIZE // 32]
    assert all(l.reg_max == 16 and l.class_num == NC for _, l in heads)
    # head input channels = 4*reg_max + nc
    assert all(ir.blobs[li].c == 4 * 16 + NC for li, _ in heads)


def test_dump_roundtrip(graph):
    """net_dump covers the new layer type without disturbing the table."""
    ir, _ = graph
    text = dump(ir)
    assert text.count(" yolov8 ") == 3
    assert "reg_max: 16" in text


def test_converter_float_census(sd):
    """Packed stream length must equal the graph's exact float demand for
    every scale the emitter supports (the loader raises otherwise)."""
    for scale in ("n", "s"):
        s = yolov8.synthesize_state_dict(8, scale, seed=1)
        cfg, wbytes = yolov8.convert(s, 8, scale, size=160)
        ir = parse_cfg(cfg, is_path=False)
        load_weights(ir, wbytes)   # raises on any census mismatch


def test_torch_differential(sd, graph):
    """The independent torch nn forward and the NumPy oracle must agree on
    every candidate of every head (no conf threshold → no knife edges).
    This validates BN folding, C2f route lowering, SPPF pool equivalence,
    and the .weights packing order in one shot."""
    torch_ref = pytest.importorskip("torch_yolov8_ref")
    ir, params = graph
    model = torch_ref.build_model(sd, NC, SCALE)

    rng = np.random.RandomState(7)
    x = rng.rand(SIZE, SIZE, 3).astype(np.float32)
    raws = torch_ref.forward_heads(model, x)
    t_cands = torch_ref.decode(raws, NC, conf=0.0)

    # oracle at conf=0: rebuild the graph with conf=0 heads
    cfg0, w0 = yolov8.convert(sd, NC, SCALE, size=SIZE, conf=0.0)
    ir0 = parse_cfg(cfg0, is_path=False)
    params0, _ = load_weights(ir0, w0)
    o_cands = numpy_ref.net_candidates(ir0, params0, x)

    assert len(t_cands) == len(o_cands) == sum(
        (SIZE // s) ** 2 for s in (8, 16, 32))
    d_score = max(abs(float(t[1]) - float(o[1]))
                  for t, o in zip(t_cands, o_cands))
    d_box = max(abs(float(tv) - float(ov))
                for t, o in zip(t_cands, o_cands)
                for tv, ov in zip(t[2:], o[2:]))
    assert d_score < 1e-3
    assert d_box < 1e-2          # net pixels
    assert all(t[0] == o[0] for t, o in zip(t_cands, o_cands))


def test_pipeline_vs_oracle(graph):
    """The jax pipeline (parity mode: f32 end-to-end, the accuracy
    product) must reproduce the oracle's detection list on the synthetic
    model: same count, same classes, boxes within f32 tolerance."""
    ir, params = graph
    net = Net(ir, params, mode="parity")
    img = (np.random.RandomState(1).rand(SIZE, SIZE, 3)
           * 255).astype(np.uint8)
    dets = net.detect(img)
    o = numpy_ref.detect(ir, params, img)
    assert len(dets) == len(o) > 0
    for d, (cls, score, x1, y1, x2, y2) in zip(dets, o):
        assert d.class_id == cls
        assert abs(d.score - float(score)) < 1e-4
        for a, b in zip((d.x1, d.y1, d.x2, d.y2), (x1, y1, x2, y2)):
            assert abs(a - b) < 0.1


def test_pure_v8_skips_arena_cap(graph):
    """Pure-v8 graphs have no bbox arena (the aliasing quirk is a
    reference-format artifact, ffcnn.c:242-244): the candidate budget is
    the full grid total, not the arena clamp."""
    ir, _ = graph
    net = Net.__new__(Net)
    net.ir = ir
    total = sum((SIZE // s) ** 2 for s in (8, 16, 32))
    assert Net._max_candidates(net) == total


def test_union_iou_nms():
    """iou_kind='union' must implement the standard metric (the v8 NMS
    policy) — cross-checked against the oracle's use_min=False path."""
    import jax.numpy as jnp

    from ffcnn_tpu.ops.nms import nms

    rng = np.random.RandomState(3)
    n = 40
    xy = rng.rand(n, 2) * 200
    wh = rng.rand(n, 2) * 80 + 10
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, 3, n)
    res = nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
              jnp.asarray(classes)[None], k=n, threshold=0.5,
              iou_kind="union")
    keep = np.asarray(res.scores[0]) > 0
    got = sorted((float(s), int(c), *map(float, b)) for s, c, b in
                 zip(np.asarray(res.scores[0])[keep],
                     np.asarray(res.classes[0])[keep],
                     np.asarray(res.boxes[0])[keep]))

    cands = [(int(c), np.float32(s), *map(float, b))
             for c, s, b in zip(classes, scores, boxes)]
    o = numpy_ref.nms(cands, 0.5, False, 1, 1)
    want = sorted((float(s), int(c), *map(float, b)) for c, s, *b in o)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[1] == w[1]
        assert all(abs(a - b) < 1e-3 for a, b in zip(g, w) if not
                   isinstance(a, int))


@pytest.fixture(scope="module")
def v8_small(sd):
    """Full v8n graph at a tiny 64x64 input (head grids 8/4/2)."""
    from ffcnn_tpu.graph.build import params_to_pytree
    cfg, wbytes = yolov8.convert(sd, NC, SCALE, size=64, conf=0.05)
    ir = parse_cfg(cfg, is_path=False)
    raw, _ = load_weights(ir, wbytes)
    return ir, params_to_pytree(raw)


def _v8_reference(ir, params, images, topk=64, thr=None):
    """Single-device f32 pixels-to-boxes mirror of what dp.py/pp.py's
    last stage does for pure-v8 graphs (decode_head_v8 + union-IoU at
    the shared v8_nms_threshold policy — the r5 review caught DP/PP
    silently keeping the darknet 0.5 while net.py used 0.7)."""
    import jax
    import jax.numpy as jnp

    from ffcnn_tpu.graph.build import forward_features
    from ffcnn_tpu.ops.nms import nms as jnms
    from ffcnn_tpu.ops.nms import v8_nms_threshold

    if thr is None:
        thr = v8_nms_threshold()
    from ffcnn_tpu.ops.preprocess import letterbox, letterbox_params
    from ffcnn_tpu.ops.yolo import concat_heads, decode_head_v8

    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    _, _, s1, s2 = letterbox_params(images.shape[2], images.shape[1],
                                    net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLOV8]

    @jax.jit
    def run(bgr):
        x = letterbox(bgr, net_w, net_h, dtype=jnp.float32)
        feats = forward_features(ir, params, x)
        d = concat_heads([decode_head_v8(f, l, net_w, net_h)
                          for f, l in zip(feats, heads_meta)])
        return jnms(d.boxes, d.scores, d.classes, k=topk, threshold=thr,
                    scale1=s1, scale2=s2, iou_kind="union")

    return run(jnp.asarray(images))


def _assert_results_match(got, want):
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(want.count))
    np.testing.assert_array_equal(np.asarray(got.classes),
                                  np.asarray(want.classes))
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.boxes),
                               np.asarray(want.boxes), atol=1e-3)


def test_dp_sharded_pipeline_v8(v8_small):
    """The GSPMD DP pipeline's anchor-free decode branch matches the
    single-device reference on an 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from ffcnn_tpu.parallel import build_sharded_pipeline, make_mesh

    ir, params = v8_small
    rng = np.random.RandomState(4)
    batch = rng.randint(0, 256, (8, 48, 64, 3), dtype=np.uint8)
    mesh = make_mesh()
    fn, place = build_sharded_pipeline(ir, mesh, 48, 64,
                                       dtype=jnp.float32, topk=64)
    got = fn(place(params), jnp.asarray(batch),
             jnp.zeros(3), jnp.full(3, 1 / 255.0))
    want = _v8_reference(ir, params, batch)
    _assert_results_match(got, want)


def test_pp_pipeline_v8(v8_small):
    """plan_stages accepts v8 heads (all in the last stage) and the
    GPipe pipeline's last-stage v8 decode matches the reference."""
    import jax
    import jax.numpy as jnp

    from ffcnn_tpu.parallel import (build_pp_pipeline, make_mesh,
                                    plan_stages)

    ir, params = v8_small
    stages = plan_stages(ir, 4)
    heads = {li for li, l in enumerate(ir.layers)
             if l.type == LayerType.YOLOV8}
    assert heads <= set(range(stages[-1].start, stages[-1].stop))

    mesh = make_mesh(jax.devices()[:4], pipeline_parallel=4)
    fn = build_pp_pipeline(ir, params, mesh, 48, 64,
                           n_microbatches=4, topk=64)
    images = np.random.RandomState(6).randint(
        0, 256, (8, 48, 64, 3), dtype=np.uint8)
    got = fn(jnp.asarray(images))
    want = _v8_reference(ir, params, images)
    _assert_results_match(got, want)


def test_cli_convert_v8(sd, tmp_path):
    """ffcnn convert-v8 writes loadable cfg+weights files that the whole
    existing surface (Net.load, detect, serve, export) consumes."""
    torch = pytest.importorskip("torch")

    from ffcnn_tpu.cli import main as cli_main

    sd_path = tmp_path / "v8n_sd.pt"
    torch.save({k: torch.as_tensor(v) for k, v in sd.items()}, sd_path)
    out = tmp_path / "v8n"
    rc = cli_main(["convert-v8", str(sd_path), "-o", str(out),
                   "--size", "160", "--conf", "0.05"])
    assert rc == 0
    net = Net.load(str(out) + ".cfg", str(out) + ".weights", mode="fast")
    img = (np.random.RandomState(5).rand(160, 160, 3)
           * 255).astype(np.uint8)
    assert isinstance(net.detect(img), list)


def test_one_call_load(sd):
    """yolov8.load: dict in → working Net (detect_stream-compatible)."""
    net = yolov8.load(sd, NC, SCALE, size=160, conf=0.05, mode="fast")
    img = (np.random.RandomState(2).rand(160, 160, 3)
           * 255).astype(np.uint8)
    dets = net.detect(img)
    assert isinstance(dets, list)


def test_export_artifact_v8(sd, tmp_path):
    """jax.export AOT artifacts work for pure-v8 graphs unchanged: the
    serialized pipeline reproduces the live Net's detections."""
    from ffcnn_tpu import export

    net = yolov8.load(sd, NC, SCALE, size=160, conf=0.05, mode="fast")
    path = str(tmp_path / "v8n.ffx")
    net.export(path, batch_size=2)
    img = (np.random.RandomState(2).rand(2, 160, 160, 3)
           * 255).astype(np.uint8)
    want = net.detect(img)
    anet = export.ArtifactNet([path])
    got = anet.detect(img)
    assert [len(g) for g in got] == [len(w) for w in want]
    for gs, ws in zip(got, want):
        for g, w in zip(gs, ws):
            assert g.class_id == w.class_id
            assert abs(g.score - w.score) < 1e-6


def test_int8_plan_on_v8(sd):
    """quant.py treats [yolov8] heads like [yolo]: the v8 head convs and
    their feeding blobs stay float in the int8 plan, and the calibrated
    net runs end to end."""
    from ffcnn_tpu.darknet.ir import LayerType as LT

    net = yolov8.load(sd, NC, SCALE, size=160, conf=0.05, mode="int8")
    img = (np.random.RandomState(3).rand(160, 160, 3)
           * 255).astype(np.uint8)
    net.calibrate(img[None])
    assert net.quant is not None
    from ffcnn_tpu.quant import _head_protect
    blobs, convs = _head_protect(net.ir)
    # the protection must reach THROUGH the box|cls concat route to the
    # actual 1x1 box/cls convs (2 per scale x 3 scales), and none of the
    # decode-feeding blobs may be int8-stored nor those convs
    # weight-quantized (the r5 review found the old one-hop rule guarded
    # the route, not the convs)
    assert len(convs) == 6
    assert all(net.ir.layers[li].type == LT.CONV for li in convs)
    assert not (set(net.quant.weights) & convs)
    assert not (set(net.quant.blob_scale) & blobs)
    # sanity: the plan still quantizes SOMETHING (backbone blobs/convs)
    assert net.quant.weights and net.quant.blob_scale
    dets = net.detect(img)
    assert isinstance(dets, list)


def test_serving_pure_v8(sd, tmp_path):
    """The HTTP serving surface works unchanged for pure-v8 graphs: the
    DetectorService/MicroBatcher path has no bbox-arena or [yolo]-head
    assumption (pure-v8 nets skip the arena quirk and use union-IoU
    NMS), and /detect responses match net.detect bit-for-bit."""
    import json
    import threading
    import urllib.request

    from ffcnn_tpu.imageio.bmp import bmp_save
    from ffcnn_tpu.serve import DetectorService, make_server

    cfg, wbytes = yolov8.convert(sd, NC, SCALE, size=64, conf=0.05)
    ir = parse_cfg(cfg, is_path=False)
    raw, _ = load_weights(ir, wbytes)
    net = Net(ir, raw, mode="parity")
    service = DetectorService(net, max_batch=1)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        service.warmup()
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        p = str(tmp_path / "in.bmp")
        bmp_save(p, img)
        with open(p, "rb") as f:
            raw_bmp = f.read()
        url = "http://127.0.0.1:%d/detect" % srv.server_address[1]
        req = urllib.request.Request(url, data=raw_bmp, method="POST")
        body = json.loads(urllib.request.urlopen(req).read())
        dets = body["detections"]
        want = net.detect(img)
        assert len(dets) == len(want)
        for d, w in zip(dets, want):
            assert d["class_id"] == w.class_id
            assert abs(d["score"] - w.score) < 1e-3
            got_box = [round(v, 2) for v in d["box"]]
            want_box = [round(v, 2) for v in (w.x1, w.y1, w.x2, w.y2)]
            assert got_box == want_box
    finally:
        srv.shutdown()


def test_detect_stream_pure_v8(sd):
    """BASELINE configs[4]'s 'streaming video batch' phrase on the v8
    path: the pipelined detect_stream (depth-2 in-flight) yields the
    same per-frame detections as serial detect() for a pure-v8 net."""
    cfg, wbytes = yolov8.convert(sd, NC, SCALE, size=64, conf=0.05)
    ir = parse_cfg(cfg, is_path=False)
    raw, _ = load_weights(ir, wbytes)
    net = Net(ir, raw, mode="parity")
    rng = np.random.RandomState(11)
    batches = [rng.randint(0, 256, (2, 64, 64, 3), np.uint8)
               for _ in range(3)]
    got = list(net.detect_stream(iter(batches), depth=2))
    assert len(got) == 3
    for b, frames in zip(batches, got):
        want = net.detect(b)
        assert len(frames) == len(want) == 2
        for f, w in zip(frames, want):
            assert [(d.class_id, round(d.score, 5)) for d in f] == \
                   [(d.class_id, round(d.score, 5)) for d in w]
