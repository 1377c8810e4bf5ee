"""Inference service: health gating, dump, and BMP-in/JSON-out detection."""

import io
import json
import os
import sys
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


class _FakeNet:
    """net.detect stand-in: returns each image's shape tag; optional per-call
    hooks let tests inject slowness or failures without compiling anything."""

    def __init__(self, hook=None):
        self.hook = hook
        self.batches = []

    def detect(self, batch):
        if self.hook:
            self.hook(batch)
        self.batches.append(batch.shape)
        return [("det", batch.shape[1:], i) for i in range(batch.shape[0])]


def test_microbatch_mixed_size_fairness():
    """A steady stream of size-A requests must not starve a size-B request
    (v1 re-queued other sizes behind the whole queue; now groups rotate)."""
    import concurrent.futures
    import time
    from ffcnn_tpu.serve import MicroBatcher

    release = threading.Event()
    served_b_at = []

    def slow(batch):
        time.sleep(0.01)                    # give A-traffic time to pile up

    net = _FakeNet(hook=slow)
    mb = MicroBatcher(net, max_batch=4, wait_timeout=30.0)
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.zeros((16, 8, 3), np.uint8)
    stop = time.monotonic() + 3.0

    def flood_a():
        while time.monotonic() < stop and not release.is_set():
            try:
                mb.detect(a)
            except Exception:
                return

    def one_b():
        mb.detect(b)
        served_b_at.append(time.monotonic())
        release.set()

    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        floods = [ex.submit(flood_a) for _ in range(4)]
        time.sleep(0.05)                    # A-traffic already flowing
        fb = ex.submit(one_b)
        fb.result(timeout=10)               # B must be served promptly
        release.set()
        for f in floods:
            f.result(timeout=10)
    assert served_b_at and served_b_at[0] < stop


def test_microbatch_backpressure_overload():
    from ffcnn_tpu.serve import MicroBatcher, Overloaded

    gate = threading.Event()
    net = _FakeNet(hook=lambda b: gate.wait(10))
    mb = MicroBatcher(net, max_batch=1, max_pending=2, wait_timeout=30.0)
    img = np.zeros((8, 8, 3), np.uint8)
    threads = [threading.Thread(target=lambda: _swallow(mb, img))
               for _ in range(6)]
    errs = []

    def _swallow(mb, img):
        try:
            mb.detect(img)
        except Overloaded as e:
            errs.append(e)

    for t in threads:
        t.start()
    import time
    time.sleep(0.3)                         # let the queue fill while blocked
    gate.set()
    for t in threads:
        t.join(timeout=10)
    assert errs, "expected Overloaded once max_pending was exceeded"


def test_microbatch_survives_detect_failure():
    """A per-round failure (incl. MemoryError-class errors) fans out to that
    round's callers and the dispatcher keeps serving later requests."""
    from ffcnn_tpu.serve import MicroBatcher

    calls = {"n": 0}

    def flaky(batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise MemoryError("boom")

    net = _FakeNet(hook=flaky)
    mb = MicroBatcher(net, max_batch=1, wait_timeout=10.0)
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(MemoryError):
        mb.detect(img)
    assert mb.detect(img)[0] == "det"       # still alive and serving
    assert mb.alive


class _FakeAsyncNet:
    """detect_async stand-in: tags each image with its dispatch round so a
    test can prove overlapped rounds never mix results, and can fail at
    COMPLETION time (the async analog of a dispatch error)."""

    def __init__(self, fail_round=None):
        self.rounds = 0
        self.fail_round = fail_round

    def detect_async(self, batch):
        self.rounds += 1
        rnd = self.rounds
        shape = batch.shape

        def finish():
            if rnd == self.fail_round:
                raise RuntimeError(f"round {rnd} failed at completion")
            return [("det", rnd, shape[1:], i) for i in range(shape[0])]
        return finish

    def detect(self, batch):                # interface completeness
        return self.detect_async(batch)()


def test_microbatch_overlapped_rounds_do_not_mix():
    """Pipelined dispatch: each caller gets its OWN round's results even
    when round i+1 is dispatched before round i completes."""
    import concurrent.futures
    from ffcnn_tpu.serve import MicroBatcher

    net = _FakeAsyncNet()
    mb = MicroBatcher(net, max_batch=2, wait_timeout=10.0)
    img = np.zeros((8, 8, 3), np.uint8)
    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        futs = [ex.submit(mb.detect, img) for _ in range(8)]
        results = [f.result(timeout=10) for f in futs]
    assert all(r[0] == "det" and r[2] == (8, 8, 3) for r in results)
    assert net.rounds >= 1
    # No cross-round leakage: each caller holds a DISTINCT (round, slot)
    # pair, and within every round the occupied slots are exactly
    # 0..k-1 (the group's own images, not another round's padding)
    pairs = [(r[1], r[3]) for r in results]
    assert len(set(pairs)) == len(pairs)
    by_round = {}
    for rnd, slot in pairs:
        by_round.setdefault(rnd, []).append(slot)
    for rnd, slots in by_round.items():
        assert sorted(slots) == list(range(len(slots))), (rnd, slots)


def test_microbatch_async_completion_failure_fans_out():
    """A failure surfacing at finish() time (async path) hits exactly that
    round's callers; the dispatcher keeps serving."""
    from ffcnn_tpu.serve import MicroBatcher

    net = _FakeAsyncNet(fail_round=1)
    mb = MicroBatcher(net, max_batch=1, wait_timeout=10.0)
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(RuntimeError, match="failed at completion"):
        mb.detect(img)
    assert mb.detect(img)[0] == "det"       # still alive and serving
    assert mb.alive
    assert mb.metrics["dispatch_errors"] == 1


def test_service_health_reflects_dead_dispatcher():
    from ffcnn_tpu.serve import MicroBatcher

    net = _FakeNet()

    class _Svc:                             # no compile: wire pieces directly
        pass

    from ffcnn_tpu.serve import DetectorService
    svc = DetectorService.__new__(DetectorService)
    svc.net = net
    svc._ready = True
    svc._error = None
    svc._batcher = MicroBatcher(net, max_batch=1)
    assert svc.ready
    svc._batcher.close()
    import time
    time.sleep(0.1)
    assert not svc.ready
    assert "not running" in svc.error
    with pytest.raises(RuntimeError):
        svc._batcher.detect(np.zeros((8, 8, 3), np.uint8))


def test_loadtest_tool(server):
    """tools/loadtest.py drives concurrent closed-loop traffic and reports
    coalescing + latency stats against a live worker."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import loadtest
    srv, service = server
    service.warmup()
    from ffcnn_tpu.imageio.bmp import bmp_save
    rng = np.random.RandomState(5)
    tmp = os.path.join("/tmp", f"lt_{os.getpid()}.bmp")
    bmp_save(tmp, rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))
    with open(tmp, "rb") as f:
        body = f.read()
    os.unlink(tmp)
    stats = loadtest.run_load(_url(srv, ""), body, clients=4, secs=2.0)
    assert stats["errors"] == 0 and stats["requests"] > 0
    assert stats["p50_ms"] is not None and stats["rps"] > 0


def test_detect_rejects_oversized_body(server):
    import http.client
    srv, service = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1])
    try:
        conn.putrequest("POST", "/detect")
        conn.putheader("Content-Length", str(service.MAX_BODY_BYTES + 1))
        conn.endheaders()
        resp = conn.getresponse()           # rejected before body is read
        assert resp.status == 413
    finally:
        conn.close()


def test_dp_serving_end_to_end():
    """serve --dp topology: one DetectorService drives the whole 8-device
    mesh through DPNet — same detections as the single-device Net, served
    over HTTP with health gating."""
    from ffcnn_tpu.imageio.bmp import bmp_save
    from ffcnn_tpu.parallel import DPNet

    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=9,
                                                     obj_bias=2.0))
    # topk = the model's full candidate capacity so the fixed-K DP
    # program never saturates (DPNet, like ArtifactNet, warns
    # instead of retrying — the K is sealed into the mesh program)
    net = Net(ir, params, mode="parity", topk=2048)
    dpnet = DPNet(net)
    assert dpnet.ndata == 8
    assert "8-way data parallel" in dpnet.dump()

    rng = np.random.RandomState(2)
    size = ir.blobs[0].w
    img = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
    want = net.detect(img)
    got = dpnet.detect(img)                    # pads 1 -> 8, single image
    assert [repr(d) for d in got] == [repr(d) for d in want]

    service = DetectorService(dpnet, max_batch=16)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        service.warmup()
        assert service.ready
        buf = io.BytesIO()
        p = "/tmp/dp_req.bmp"
        bmp_save(p, img)
        req = urllib.request.Request(_url(srv, "/detect"),
                                     data=open(p, "rb").read(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            dets = json.loads(r.read())["detections"]
        assert len(dets) == len(want)
    finally:
        srv.shutdown()


def test_statz_endpoint(server, tmp_path):
    srv, service = server
    service.warmup()
    from ffcnn_tpu.imageio.bmp import bmp_save
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "s.bmp")
    bmp_save(p, img)
    with open(p, "rb") as f:
        raw = f.read()
    req = urllib.request.Request(_url(srv, "/detect"), data=raw, method="POST")
    urllib.request.urlopen(req)
    stats = json.loads(urllib.request.urlopen(_url(srv, "/statz")).read())
    assert stats["requests"] >= 1
    assert stats["images"] >= 1
    assert stats["dispatches"] >= 1
    assert stats["ready"] is True
    assert stats["pending"] == 0
    assert stats["dispatch_p50_ms"] is None or stats["dispatch_p50_ms"] > 0
    # every dispatch lands in a power-of-two bucket of the histogram
    assert sum(stats["batch_hist"].values()) == stats["dispatches"]
    assert all(int(k) & (int(k) - 1) == 0 for k in stats["batch_hist"])


def test_warm_hw_prewarms_request_geometry():
    """--warm-hw contract: a geometry passed at construction is compiled
    during warmup, so the first real request at that size hits a warm
    pipeline bucket (no new compile).  Measured motivation: a cold
    geometry x batch bucket mid-traffic cost p99 21 s in the r4 device
    loadtest vs ~0.6 s warm (docs/PERF_NOTES.md "Serving loadtest")."""
    from ffcnn_tpu.serve import parse_geometry
    assert parse_geometry("640x480") == (480, 640)
    with pytest.raises(ValueError):
        parse_geometry("0x32")

    ir = parse_cfg(MICRO)
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7))
    net = Net(ir, params, mode="parity")
    service = DetectorService(net, warm_hw=(parse_geometry("64x48"),),
                              warm_batches=(1,))
    service.warmup()
    n_buckets = len(net._pipelines)
    # batch-1 request at the pre-warmed geometry: no new pipeline bucket
    dets = net.detect(np.zeros((48, 64, 3), np.uint8))
    assert isinstance(dets, list)
    assert len(net._pipelines) == n_buckets
    # a geometry that was NOT warmed does compile a fresh bucket
    net.detect(np.zeros((32, 32, 3), np.uint8))
    assert len(net._pipelines) == n_buckets + 1
