"""AOT export artifacts (export.py): the serialized pipeline must be
self-contained (weights baked), bit-identical to the live pipeline, and
loadable without the cfg/weights pair."""

import os

import numpy as np
import pytest

import conftest
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import synth_weights_bytes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture()
def micro_net(tmp_path):
    from ffcnn_tpu import Net
    ir = parse_cfg(MICRO)
    wpath = str(tmp_path / "micro.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    return Net.load(MICRO, wpath, mode="fast")


def test_export_roundtrip_bit_identical(micro_net, tmp_path):
    from ffcnn_tpu.export import load_exported

    net = micro_net
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 256, (2, net_h, net_w, 3), dtype=np.uint8)

    path = str(tmp_path / "micro.ffx")
    nbytes = net.export(path, batch_size=2)
    assert nbytes == os.path.getsize(path) > 1000

    art = load_exported(path)
    assert art.in_shape == (2, net_h, net_w, 3)
    got = art.call(batch)
    want = net.detect_device(batch)
    for a, b, nm in zip(got, want,
                        ("boxes", "scores", "classes", "count", "sat")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_export_artifact_is_self_contained(micro_net, tmp_path):
    """Deserialization must not need the Net, cfg, or weights objects —
    only the artifact file."""
    from ffcnn_tpu.export import load_exported

    net = micro_net
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    path = str(tmp_path / "micro.ffx")
    net.export(path)
    want = net.detect_device(np.zeros((1, net_h, net_w, 3), np.uint8))
    del net

    art = load_exported(path)
    got = art.call(np.zeros((1, net_h, net_w, 3), np.uint8))
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]))


def test_artifact_net_serving(micro_net, tmp_path):
    """ArtifactNet routes to the right bucket, pads, and serves through
    DetectorService end-to-end — a worker with only artifact files."""
    from ffcnn_tpu.export import ArtifactNet
    from ffcnn_tpu.serve import DetectorService

    net = micro_net
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    p1 = str(tmp_path / "b1.ffx")
    p4 = str(tmp_path / "b4.ffx")
    net.export(p1, batch_size=1)
    net.export(p4, batch_size=4)

    anet = ArtifactNet([p1, p4])
    assert anet.input_hw == (net_h, net_w)
    assert anet.max_batch == 4
    assert "batch    4" in anet.dump()

    rng = np.random.RandomState(3)
    batch = rng.randint(0, 256, (3, net_h, net_w, 3), dtype=np.uint8)
    got = anet.detect(batch)                  # pads 3 -> the 4-bucket
    want = net.detect(batch)
    assert len(got) == 3
    for g, w_ in zip(got, want):
        assert [d.class_id for d in g] == [d.class_id for d in w_]
        for a, b in zip(g, w_):
            assert abs(a.score - b.score) < 1e-6

    # async dispatch (the serving micro-batcher's overlap path) is
    # result-identical to the synchronous call
    got_async = anet.detect_async(batch)()
    assert len(got_async) == 3
    for g, w_ in zip(got_async, got):
        assert [(d.class_id, d.score) for d in g] == \
            [(d.class_id, d.score) for d in w_]

    with pytest.raises(ValueError, match="exceeds largest"):
        anet.detect(np.zeros((5, net_h, net_w, 3), np.uint8))
    with pytest.raises(ValueError, match="no artifact for"):
        anet.detect(np.zeros((1, net_h + 32, net_w, 3), np.uint8))

    svc = DetectorService(anet, max_batch=anet.max_batch)
    svc.warmup()
    assert svc.ready
    from ffcnn_tpu.imageio.bmp import bmp_save
    p = str(tmp_path / "req.bmp")
    bmp_save(p, batch[0])
    dets = svc.detect_bmp_bytes(open(p, "rb").read())
    assert dets == [{"score": round(d.score, 4), "class_id": d.class_id,
                     "box": [round(v, 2) for v in (d.x1, d.y1, d.x2, d.y2)]}
                    for d in want[0]]


def test_cli_export_multi_bucket(tmp_path, capsys):
    from ffcnn_tpu.cli import main
    from ffcnn_tpu.export import ArtifactNet

    ir = parse_cfg(MICRO)
    wpath = str(tmp_path / "micro.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    out = str(tmp_path / "m.ffx")
    assert main(["export", out, "--batch", "1,2", "--mode", "fast",
                 "--cfg", MICRO, "--weights", wpath]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    anet = ArtifactNet([str(tmp_path / "m.b1.ffx"),
                        str(tmp_path / "m.b2.ffx")])
    assert anet.max_batch == 2


def test_export_int8_mode_roundtrip(tmp_path):
    """Export composes with the int8 pipeline (quantized weights + scales
    baked into the artifact like the float ones)."""
    from ffcnn_tpu import Net
    from ffcnn_tpu.export import load_exported

    ir = parse_cfg(MICRO)
    wpath = str(tmp_path / "micro.weights")
    with open(wpath, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    net = Net.load(MICRO, wpath, mode="int8")
    net_h, net_w = ir.blobs[0].h, ir.blobs[0].w
    rng = np.random.RandomState(5)
    calib = rng.randint(0, 256, (2, net_h, net_w, 3), dtype=np.uint8)
    net.calibrate(calib)

    path = str(tmp_path / "micro_int8.ffx")
    net.export(path, batch_size=2)
    art = load_exported(path)
    got = art.call(calib)
    want = net.detect_device(calib)
    for a, b, nm in zip(got, want,
                        ("boxes", "scores", "classes", "count", "sat")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


def test_export_writes_meta_sidecar(micro_net, tmp_path):
    """export_net records the custom-call targets (the libtpu ABI surface a
    deployment pins) and a golden probe in <path>.meta.json (ADVICE r2)."""
    import json

    from ffcnn_tpu.export import load_exported, meta_path

    path = str(tmp_path / "micro.ffx")
    micro_net.export(path, batch_size=1)
    with open(meta_path(path)) as f:
        meta = json.load(f)
    assert isinstance(meta["custom_call_targets"], list)
    assert meta["jax_version"]
    assert "expected" in meta["probe"]
    art = load_exported(path)
    assert art.meta == meta


def test_artifact_probe_gate(micro_net, tmp_path):
    """The semantic health gate (VERDICT r2 #7): a worker serving an
    artifact whose baked probe does not reproduce must NOT go ready —
    DetectorService.warmup raises and /healthz-style readiness stays off."""
    import shutil

    from ffcnn_tpu import Net
    from ffcnn_tpu.export import (ArtifactNet, load_exported, meta_path,
                                  verify_artifact)
    from ffcnn_tpu.serve import DetectorService

    good = str(tmp_path / "good.ffx")
    micro_net.export(good, batch_size=1)
    verify_artifact(load_exported(good))          # healthy artifact passes
    ArtifactNet([good]).warmup()

    # A stale/mismatched artifact: same graph, DIFFERENT weights — shape
    # checks pass, semantics don't.
    ir = parse_cfg(MICRO)
    wpath2 = str(tmp_path / "other.weights")
    with open(wpath2, "wb") as f:
        f.write(synth_weights_bytes(ir, seed=99, obj_bias=2.0))
    other = Net.load(MICRO, wpath2, mode="fast")
    stale = str(tmp_path / "stale.ffx")
    other.export(stale, batch_size=1)
    # Swap in the GOOD net's meta — the deployment thinks it shipped the
    # good model but the artifact bytes are another net's.
    shutil.copy(meta_path(good), meta_path(stale))
    with pytest.raises(RuntimeError, match="golden-probe mismatch"):
        verify_artifact(load_exported(stale))

    svc = DetectorService(ArtifactNet([stale]))
    with pytest.raises(RuntimeError, match="golden-probe mismatch"):
        svc.warmup()
    assert not svc.ready
    assert "golden-probe mismatch" in svc.error


def test_artifact_without_meta_warns_not_fails(micro_net, tmp_path):
    """Backward compat: a bare artifact (no sidecar) still serves, with a
    warning that the semantic gate is unavailable."""
    import os as _os

    from ffcnn_tpu.export import ArtifactNet, meta_path

    path = str(tmp_path / "bare.ffx")
    micro_net.export(path, batch_size=1)
    _os.remove(meta_path(path))
    anet = ArtifactNet([path])
    with pytest.warns(RuntimeWarning, match="no .meta.json"):
        anet.warmup()


def test_export_rejects_wrong_shape(micro_net, tmp_path):
    from ffcnn_tpu.export import load_exported

    net = micro_net
    path = str(tmp_path / "micro.ffx")
    net.export(path, batch_size=2)
    art = load_exported(path)
    net_h, net_w = net.ir.blobs[0].h, net.ir.blobs[0].w
    with pytest.raises(ValueError, match="artifact expects"):
        art.call(np.zeros((3, net_h, net_w, 3), np.uint8))
    with pytest.raises(ValueError, match="artifact expects"):
        art.call(np.zeros((2, net_h, net_w, 3), np.float32))
