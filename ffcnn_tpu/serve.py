"""Minimal inference service over the TPU pipeline.

The reference is a library + demo binary; for production deployment the
TPU build adds a thin HTTP serving layer (stdlib-only) with the health
checking SURVEY.md §5 calls for:

    GET  /healthz          -> 200 "ok" once the model is compiled and a
                              probe inference has run
    GET  /dump             -> the net_dump layer table
    POST /detect           -> body: one 24-bit BMP; response: JSON
                              {"detections": [{score, class_id, box}, ...]}

Concurrent requests are MICRO-BATCHED: the chip's throughput comes from
batching (one image ≈ 30 ms incl. tunnel RTT; 256 images ≈ 8 ms total), so
request threads enqueue decoded images and a single dispatcher thread drains
the queue into one padded device batch per dispatch — same-size images share
a dispatch, and the batch dim is bucketed to powers of two so steady load
reuses a handful of compiled pipelines.  A fronting load balancer shards
across processes/chips; DP across chips is the parallel/dp.py pipeline.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Pending:
    __slots__ = ("img", "event", "result", "error")

    def __init__(self, img):
        self.img = img
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Collect concurrent same-size requests into one device dispatch.

    Dispatcher loop: block for one request, then drain whatever else is
    already queued (up to ``max_batch``, same HxW only), pad the batch dim
    up to a power of two, run one detect, scatter results."""

    def __init__(self, net, max_batch: int = 64):
        self.net = net
        self.max_batch = max_batch
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def detect(self, img):
        p = _Pending(img)
        self._q.put(p)
        p.event.wait()
        if p.error is not None:
            raise p.error
        return p.result

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def _loop(self):
        while True:
            first = self._q.get()
            group = [first]
            deferred = []
            while len(group) < self.max_batch:
                try:
                    p = self._q.get_nowait()
                except queue.Empty:
                    break
                if p.img.shape == first.img.shape:
                    group.append(p)
                else:
                    deferred.append(p)       # different size: next rounds
            for p in deferred:
                self._q.put(p)
            n = self._bucket(len(group))
            batch = np.zeros((n,) + first.img.shape, np.uint8)
            for i, p in enumerate(group):
                batch[i] = p.img
            try:
                results = self.net.detect(batch)
            except Exception as e:  # noqa: BLE001 — fan the error out
                for p in group:
                    p.error = e
                    p.event.set()
                continue
            for p, dets in zip(group, results):
                p.result = dets
                p.event.set()


class DetectorService:
    def __init__(self, net, probe_hw=None, max_batch: int = 64):
        self.net = net
        self._ready = False
        self._error: str | None = None
        self._batcher = MicroBatcher(net, max_batch=max_batch)
        # Probe at the model's own input size: each distinct request image
        # size still compiles its own pipeline bucket lazily on first use,
        # but the common case (images at/near net dims) is hot at ready time.
        self._probe_hw = probe_hw or (net.ir.blobs[0].h, net.ir.blobs[0].w)

    def warmup(self):
        """Compile + run one probe so /healthz reflects real readiness.
        A warmup failure is captured and surfaced through /healthz rather
        than dying silently in the background thread."""
        try:
            self.net.warmup(image_sizes=[self._probe_hw])
            self._ready = True
        except Exception as e:  # noqa: BLE001 — report via health check
            self._error = f"{type(e).__name__}: {e}"
            raise

    @property
    def ready(self) -> bool:
        return self._ready

    @property
    def error(self) -> str | None:
        return self._error

    def detect_bmp_bytes(self, raw: bytes):
        from .imageio.bmp import bmp_decode
        img = bmp_decode(raw)
        dets = self._batcher.detect(img)     # concurrent requests coalesce
        return [{"score": round(d.score, 4), "class_id": d.class_id,
                 "box": [round(v, 2) for v in (d.x1, d.y1, d.x2, d.y2)]}
                for d in dets]


def make_server(service: DetectorService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):           # quiet; structured logs upstream
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if service.ready:
                    self._send(200, b"ok", "text/plain")
                elif service.error:
                    self._send(503, f"warmup failed: {service.error}"
                               .encode(), "text/plain")
                else:
                    self._send(503, b"warming up", "text/plain")
            elif self.path == "/dump":
                self._send(200, service.net.dump().encode(), "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/detect":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(n)
            try:
                dets = service.detect_bmp_bytes(raw)
            except Exception as e:  # noqa: BLE001 — surface as 400
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            self._send(200, json.dumps({"detections": dets}).encode())

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    import argparse
    import os
    if os.environ.get("FFCNN_NO_COMPILE_CACHE") != "1":
        from . import enable_compile_cache
        enable_compile_cache()
    ap = argparse.ArgumentParser(prog="ffcnn-serve")
    ap.add_argument("--cfg", default="/root/reference/yolo-fastest-1.1.cfg")
    ap.add_argument("--weights",
                    default="/root/reference/yolo-fastest-1.1.weights")
    ap.add_argument("--mode", choices=("fast", "parity"), default="fast")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args(argv)

    from . import Net
    net = Net.load(args.cfg, args.weights, mode=args.mode,
                   cache_dir=args.cache_dir)
    service = DetectorService(net)
    server = make_server(service, args.host, args.port)
    threading.Thread(target=service.warmup, daemon=True).start()
    print(f"serving on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
