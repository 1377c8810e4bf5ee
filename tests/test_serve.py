"""Inference service: health gating, dump, and BMP-in/JSON-out detection."""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from ffcnn_tpu import Net
from ffcnn_tpu.darknet import parse_cfg
from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
from ffcnn_tpu.serve import DetectorService, make_server

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MICRO = os.path.join(REPO, "models", "ffcnn-micro.cfg")


@pytest.fixture(scope="module")
def server():
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    net = Net(ir, params, mode="parity")
    service = DetectorService(net)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, service
    finally:
        srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def test_healthz_gates_on_warmup(server):
    srv, service = server
    if not service.ready:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(_url(srv, "/healthz"))
        assert ei.value.code == 503
    service.warmup()
    r = urllib.request.urlopen(_url(srv, "/healthz"))
    assert r.status == 200 and r.read() == b"ok"


def test_dump_endpoint(server):
    srv, service = server
    r = urllib.request.urlopen(_url(srv, "/dump"))
    assert b"yolo" in r.read()


def test_detect_endpoint(server, tmp_path):
    srv, service = server
    service.warmup()
    from ffcnn_tpu.imageio.bmp import bmp_save
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "in.bmp")
    bmp_save(p, img)
    with open(p, "rb") as f:
        raw = f.read()
    req = urllib.request.Request(_url(srv, "/detect"), data=raw, method="POST")
    r = urllib.request.urlopen(req)
    body = json.loads(r.read())
    dets = body["detections"]
    want = service.net.detect(img)
    assert len(dets) == len(want)
    for d, w in zip(dets, want):
        assert d["class_id"] == w.class_id
        assert abs(d["score"] - w.score) < 1e-3


def test_detect_rejects_garbage(server):
    srv, service = server
    req = urllib.request.Request(_url(srv, "/detect"), data=b"nonsense",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_debug_nans_clean():
    """SURVEY §5: the whole pipeline runs clean under jax_debug_nans —
    no NaNs are produced on the fast path for in-range inputs."""
    import jax
    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7, obj_bias=2.0))
    jax.config.update("jax_debug_nans", True)
    try:
        net = Net(ir, params, mode="parity")
        rng = np.random.RandomState(0)
        net.detect(rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_microbatch_concurrent_requests_correct(server, tmp_path):
    """Concurrent requests coalesce into one padded dispatch and each caller
    gets ITS image's detections (and mixed sizes are still served)."""
    import concurrent.futures
    srv, service = server
    service.warmup()
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(6)]
    imgs.append(rng.randint(0, 256, (96, 64, 3), dtype=np.uint8))  # odd size
    want = [service.net.detect(im) for im in imgs]

    def one(im):
        return service._batcher.detect(im)

    with concurrent.futures.ThreadPoolExecutor(7) as ex:
        got = list(ex.map(one, imgs))
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for a, b in zip(g, w):
            assert a.class_id == b.class_id
            assert abs(a.score - b.score) < 1e-6
            assert abs(a.x1 - b.x1) < 1e-4


def test_microbatch_bucket_powers_of_two():
    from ffcnn_tpu.serve import MicroBatcher
    assert [MicroBatcher._bucket(n) for n in (1, 2, 3, 5, 8, 9)] == \
        [1, 2, 4, 8, 8, 16]
