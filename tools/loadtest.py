#!/usr/bin/env python
"""Closed-loop load generator for the serving layer (serve.py).

N concurrent clients POST one BMP each, back to back, for a fixed
duration against a running worker (default: a micro-model worker spawned
in-process).  Reports one JSON line: request rate, latency percentiles,
micro-batch coalescing efficiency (images per dispatch, from /statz),
and error counts — the numbers a capacity planner needs beyond bench.py's
raw pipeline rate.

    /opt/venv/bin/python tools/loadtest.py --clients 8 --secs 5
    /opt/venv/bin/python tools/loadtest.py --url http://127.0.0.1:8600 img.bmp
"""
import argparse
import http.client
import io
import json
import os
import sys
import threading
import time
import urllib.parse

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spawn_micro():
    """In-process micro-model worker on an ephemeral port (CPU-friendly;
    used by tests and for exercising the HTTP/batching path without the
    flagship's compile time)."""
    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("FFCNN_PLATFORM", "cpu"))
    import numpy as np

    from ffcnn_tpu import Net
    from ffcnn_tpu.darknet import parse_cfg
    from ffcnn_tpu.darknet.weights import load_weights, synth_weights_bytes
    from ffcnn_tpu.serve import DetectorService, make_server

    ir = parse_cfg(os.path.join(REPO, "models", "ffcnn-micro.cfg"))
    params, _ = load_weights(ir, synth_weights_bytes(ir, seed=7,
                                                     obj_bias=2.0))
    net = Net(ir, params, mode="fast")
    service = DetectorService(net, max_batch=16)
    srv = make_server(service, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    service.warmup()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _probe_bmp(path=None):
    if path:
        with open(path, "rb") as f:
            return f.read()
    import numpy as np

    from ffcnn_tpu.imageio.bmp import bmp_save
    rng = np.random.RandomState(0)
    tmp = os.path.join("/tmp", f"loadtest_{os.getpid()}.bmp")
    bmp_save(tmp, rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))
    with open(tmp, "rb") as f:
        raw = f.read()
    os.unlink(tmp)
    return raw


def run_load(url: str, body: bytes, clients: int, secs: float):
    u = urllib.parse.urlparse(url)
    stop = time.monotonic() + secs
    lats, errors = [], [0]
    lock = threading.Lock()

    def client():
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
        my_lats, my_errs = [], 0
        try:
            while time.monotonic() < stop:
                t0 = time.perf_counter()
                try:
                    conn.request("POST", "/detect", body=body)
                    resp = conn.getresponse()
                    resp.read()
                    if resp.status != 200:
                        my_errs += 1
                        continue
                except Exception:
                    my_errs += 1
                    conn.close()
                    conn = http.client.HTTPConnection(u.hostname, u.port,
                                                      timeout=30)
                    continue
                my_lats.append(time.perf_counter() - t0)
        finally:
            conn.close()
            with lock:
                lats.extend(my_lats)
                errors[0] += my_errs

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lats.sort()
    pct = (lambda q: round(lats[min(len(lats) - 1, int(q * len(lats)))]
                           * 1000, 2)) if lats else (lambda q: None)
    return {"clients": clients, "secs": round(wall, 2),
            "requests": len(lats), "rps": round(len(lats) / wall, 1),
            "p50_ms": pct(0.50), "p90_ms": pct(0.90), "p99_ms": pct(0.99),
            "errors": errors[0]}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None,
                    help="BMP to post (default: a generated 64x64 frame)")
    ap.add_argument("--url", default=None,
                    help="target worker (default: spawn an in-process "
                         "micro-model worker)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--secs", type=float, default=5.0)
    args = ap.parse_args(argv)

    srv = None
    url = args.url
    if url is None:
        srv, url = _spawn_micro()
    body = _probe_bmp(args.image)
    try:
        stats = run_load(url, body, args.clients, args.secs)
        # micro-batching efficiency from the worker itself
        try:
            import urllib.request
            z = json.loads(urllib.request.urlopen(url + "/statz",
                                                  timeout=10).read())
            stats["images_per_dispatch"] = round(
                z["images"] / max(1, z["dispatches"]), 2)
            stats["dispatches"] = z["dispatches"]
            stats["overloaded"] = z.get("overloaded", 0)
        except Exception:
            pass
        print(json.dumps(stats))
    finally:
        if srv is not None:
            srv.shutdown()
    return 0


if __name__ == "__main__":
    main()
