#!/usr/bin/env python
"""Headline benchmark: yolo-fastest-1.1 images/sec/chip at 320x320.

Protocol:
  1. Parity gate — the parity-mode pipeline must reproduce the C reference's
     golden detections on the 320x320 fixture (classes + int-cast boxes
     exact).  A perf number from a wrong model is meaningless.
  2. Throughput — fast mode (bf16 activations, fp32 MXU accumulation),
     device-resident uint8 input, full pixels-to-boxes pipeline (letterbox +
     131-layer forward + YOLO decode + NMS).  Timed as N dispatches with one
     trailing sync so the ~30 ms axon-tunnel RTT isn't billed per batch;
     batch size swept, then the MEDIAN of >=5 timed windows at the best
     batch is the headline, with the per-window values and spread in the
     JSON (VERDICT r4 #1: single windows swing ~4% tunnel-to-tunnel; the
     reference's own published number is a 100-iteration average,
     readme.txt:114-126).
  3. The headline mode is pinned to fast — the deployable mode (parity
     meets the 1e-3 accuracy bar; fast holds wide-corpus wmAP@0.5 0.961;
     int8 was demoted on the wide corpus, docs/PERF_NOTES.md).  int8 and
     parity throughputs are reported as their own rows: parity_img_s is
     the configuration that satisfies BOTH halves of the north star
     (>=10k img/s AND detections matching the C output within 1e-3).

Baseline: the C reference (conv-v6 build, this container's CPU) measured at
320x320: 847 ms / 20 inferences = 23.6 img/s (see BASELINE.md; the published
i5-1155G7 number is 14.8 img/s at 640x448).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N, ...}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
FIXTURES = os.path.join(REPO, "tests", "fixtures")
BASELINE_IMG_S = 23.6          # reference conv-v6 @320x320 on this host CPU
SIZE = 320
BATCHES = (256, 384, 512)
ITERS = 30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def noisy_batches(img, batch, n_batches, seed=0):
    """The benchmark workload recipe, shared with tools/bench_stream.py:
    real image content (the reference's own benchmark loops test.bmp,
    readme.txt:114 — random-noise frames decode to hundreds of spurious
    boxes, which is not a detection workload) plus per-image noise so
    frames are distinct."""
    import numpy as np
    rng = np.random.RandomState(seed)
    base = np.broadcast_to(img, (batch,) + img.shape)
    out = []
    for _ in range(n_batches):
        noise = rng.randint(0, 8, base.shape, dtype=np.uint8)
        out.append(np.clip(base.astype(np.int16) + noise, 0, 255)
                   .astype(np.uint8))
    return out


def _check_golden(dets, golden_file):
    golden = []
    with open(golden_file) as f:
        for line in f:
            score = float(line.split("score:")[1].split(",")[0])
            cat = int(line.split("category:")[1].split(",")[0])
            rect = [int(v) for v in line.split("(")[1].split(")")[0].split()]
            golden.append((cat, score, rect))
    assert len(dets) == len(golden), (dets, golden)
    for d, (cat, score, rect) in zip(dets, golden):
        assert d.class_id == cat, (d, cat)
        assert abs(d.score - score) < 5e-3, (d, score)
        assert [int(d.x1), int(d.y1), int(d.x2), int(d.y2)] == rect, (d, rect)
    return len(golden)


def parity_gate():
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="parity")
    bgr = bmp_load(os.path.join(FIXTURES, "test320.bmp"))
    n = _check_golden(net.detect(bgr),
                      os.path.join(FIXTURES, "golden_boxes_320x320.txt"))
    log("parity gate 320x320: %d golden detections exact" % n)

    # Second gate: the reference demo's own geometry (640x448, ALIGN-32
    # input override per ffcnn.c:133-134,573) through the jitted pipeline.
    net648 = Net.load(CFG, WEIGHTS, 640, 448, mode="parity")
    bgr648 = bmp_load("/root/reference/test.bmp")
    n = _check_golden(net648.detect(bgr648),
                      os.path.join(FIXTURES, "golden_boxes_640x448.txt"))
    log("parity gate 640x448 (demo geometry): %d golden detections exact" % n)


def int8_gate():
    """int8 accuracy gate: same objects as the golden output, classes exact,
    boxes within the fast-mode tolerance (VERDICT r1 item 2)."""
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="int8")
    bgr = bmp_load(os.path.join(FIXTURES, "test320.bmp"))
    net.calibrate(bgr[None])
    dets = net.detect(bgr)
    golden = []
    with open(os.path.join(FIXTURES, "golden_boxes_320x320.txt")) as f:
        for line in f:
            score = float(line.split("score:")[1].split(",")[0])
            cat = int(line.split("category:")[1].split(",")[0])
            rect = [int(v) for v in line.split("(")[1].split(")")[0].split()]
            golden.append((cat, score, rect))
    assert len(dets) == len(golden), (dets, golden)
    for d, (cat, score, rect) in zip(dets, golden):
        assert d.class_id == cat, (d, cat)
        assert abs(d.score - score) < 0.05, (d, score)
        for got, want in zip((d.x1, d.y1, d.x2, d.y2), rect):
            assert abs(got - want) < 12, (d, rect)
    log("int8 gate: %d golden objects, classes exact, boxes in tolerance"
        % len(golden))
    return net


def _timed_windows(net, bj, n_windows, iters=None):
    """img/s of ``n_windows`` independent timing windows (each: ITERS
    dispatches + one trailing sync) over an already-compiled bucket."""
    import jax
    iters = iters or ITERS
    b = bj.shape[0]
    out = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            res = net.detect_device(bj)
        jax.block_until_ready(res)
        out.append(b / ((time.perf_counter() - t0) / iters))
    return out


def throughput(mode="fast", net=None, batches=None, final_windows=5):
    """Batch sweep (best-of-3 windows per size picks the batch), then
    ``final_windows`` more windows at the winning batch.  Returns
    (median img/s, batch, net, window list) — median, not best: the
    VERDICT r4 variance protocol."""
    import statistics

    import jax
    import numpy as np
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    import jax.numpy as jnp

    if net is None:
        net = Net.load(CFG, WEIGHTS, mode=mode)
    best = (0.0, 0, None)
    # Real image content (the reference's own benchmark loops test.bmp,
    # readme.txt:114): random-noise frames decode to hundreds of spurious
    # above-threshold boxes per image, which is not a detection workload.
    # Per-image noise keeps frames distinct.
    img = bmp_load(os.path.join(FIXTURES, "test320.bmp"))
    for bi, b in enumerate(batches or BATCHES):
        (batch,) = noisy_batches(img, b, 1, seed=bi)
        bj = jnp.asarray(batch)                 # one-time host->HBM transfer
        res = net.detect_device(bj)             # compile
        jax.block_until_ready(res)
        ips = max(_timed_windows(net, bj, 3))   # best-of-3 picks the batch
        log("%s batch %4d: %8.0f img/s (batch-pick window)" % (mode, b, ips))
        if ips > best[0]:
            best = (ips, b, bj)
    _, b, bj = best
    windows = sorted(_timed_windows(net, bj, final_windows))
    med = statistics.median(windows)
    log("%s batch %4d: median %8.0f img/s over %d windows "
        "(min %8.0f  max %8.0f  spread %.1f%%)"
        % (mode, b, med, len(windows), windows[0], windows[-1],
           (windows[-1] - windows[0]) / med * 100))
    return med, b, net, windows


def throughput_stream(net):
    """Host-resident-input throughput through the pipelined detect_stream
    path: distinct numpy batches, so every batch pays its host->HBM copy
    and result decode — but overlapped with compute (depth 2).  The
    number a frame-stream consumer (file reader, video) actually sees;
    the headline above excludes host IO by reusing a device buffer."""
    import numpy as np
    from ffcnn_tpu.imageio.bmp import bmp_load

    img = bmp_load(os.path.join(FIXTURES, "test320.bmp"))
    b, n_batches = 256, 6
    batches = noisy_batches(img, b, n_batches)
    for _ in net.detect_stream(batches[:1]):       # warm (compile hits cache)
        pass
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in net.detect_stream(batches, depth=2):
            pass
        dt = min(dt, time.perf_counter() - t0)
    ips = b * n_batches / dt
    log("host-input stream (batch 256 x 6, depth 2): %8.0f img/s" % ips)
    return ips


def throughput_demo_geometry():
    """Throughput at the reference demo's OWN geometry (test.bmp 640x448,
    ALIGN-32 input override, ffcnn.c:133-134,573) — the workload behind
    readme.txt:114's published 67.5 ms/img.  Batch sized for the 4.2x
    larger frames."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, 640, 448, mode="fast")
    img = bmp_load("/root/reference/test.bmp")
    b = 128
    (batch,) = noisy_batches(img, b, 1)
    bj = jnp.asarray(batch)
    jax.block_until_ready(net.detect_device(bj))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            res = net.detect_device(bj)
        jax.block_until_ready(res)
        dt = min(dt, (time.perf_counter() - t0) / ITERS)
    ips = b / dt
    log("demo geometry 640x448 batch %d: %.2f ms/batch  %8.0f img/s"
        % (b, dt * 1000, ips))
    return ips


def latency_batch1():
    """Single-image latency, fast mode: (p50 wall dispatch-to-sync, device
    time from a profiler trace).  Wall includes the ~30 ms axon-tunnel RTT,
    which is an artifact of this environment, so the device number is the
    honest on-chip latency (VERDICT r1 weak-4)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from ffcnn_tpu import Net
    from ffcnn_tpu.imageio.bmp import bmp_load

    net = Net.load(CFG, WEIGHTS, mode="fast")
    img = jnp.asarray(bmp_load(os.path.join(FIXTURES, "test320.bmp"))[None])
    jax.block_until_ready(net.detect_device(img))
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(net.detect_device(img))
        times.append(time.perf_counter() - t0)
    times.sort()

    tmp = tempfile.mkdtemp(prefix="bench_lat_")
    with jax.profiler.trace(tmp):
        for _ in range(20):
            r = net.detect_device(img)
        jax.block_until_ready(r)
    try:
        from ffcnn_tpu.profiling import device_op_time_ms
        dev_ms = device_op_time_ms(tmp, 20)   # all shards, shared parser
    except RuntimeError:
        dev_ms = float("nan")
    return times[len(times) // 2] * 1000, dev_ms


def supervise():
    """Run the measurement in a child process with a timeout and retries.

    The axon tunnel can wedge so that one program hangs indefinitely while
    the chip itself stays healthy (CLAUDE.md "chip-wedging"); a bare hang
    here would record nothing for the whole round.  A fresh process +
    idle gap is exactly the documented recovery, so: up to 3 attempts,
    forwarding the child's one JSON line on success."""
    import subprocess

    child_timeout = float(os.environ.get("FFCNN_BENCH_TIMEOUT", "1800"))
    retry_sleep = float(os.environ.get("FFCNN_BENCH_RETRY_SLEEP", "150"))
    env = dict(os.environ, FFCNN_BENCH_CHILD="1")
    for attempt in range(3):
        if attempt:
            log("bench attempt %d failed; idling %.0f s for tunnel recovery"
                % (attempt, retry_sleep))
            time.sleep(retry_sleep)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, timeout=child_timeout)
        except subprocess.TimeoutExpired:
            log("bench child timed out (attempt %d)" % (attempt + 1))
            continue
        lines = out.stdout.decode().strip().splitlines()
        if out.returncode == 0 and lines:
            try:
                json.loads(lines[-1])
            except ValueError:
                log("bench child emitted no JSON (attempt %d)" % (attempt + 1))
                continue
            print(lines[-1])
            return 0
        log("bench child exited %d (attempt %d)"
            % (out.returncode, attempt + 1))
    # Distinguish "tunnel dead" from "our code broke": an 8x128 elementwise
    # jit hanging means NO program can run (infra), and the record should
    # say so rather than implicate the framework.
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jax.jit(lambda v: (v*2).sum())"
             "(jnp.ones((8,128)))))"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, timeout=90)
        probe_state = "ok" if probe.returncode == 0 else "error"
    except subprocess.TimeoutExpired:
        probe_state = "hang"
    print(json.dumps({
        "metric": "yolo-fastest-1.1 320x320 pixels-to-boxes throughput",
        "value": 0, "unit": "img/s/chip", "vs_baseline": 0,
        "error": "all bench attempts hung or failed",
        "tiny_probe": probe_state,
        "diagnosis": ("axon tunnel down (even trivial programs hang)"
                      if probe_state == "hang" else
                      "device reachable but the pipeline failed — "
                      "see bench logs")}))
    return 1


def main():
    # Persistent XLA compile cache: the bench child compiles ~10 full-net
    # buckets (parity 320 + 640x448, int8, fast/int8 batch sweep, demo
    # geometry, batch-1); through a DEGRADED axon tunnel each cold compile
    # can take 240 s+ (CLAUDE.md) and blow the supervisor's child timeout,
    # while cached reloads take seconds — so a retry after a hang actually
    # gets further instead of starting over.  Compile time is never part
    # of the measured windows, so the numbers are unaffected.
    from ffcnn_tpu import enable_compile_cache
    enable_compile_cache()
    parity_gate()
    int8_net = int8_gate()
    fast_ips, fast_batch, fast_net, fast_windows = throughput("fast")
    # int8: informational row only — the wide-corpus verdict demoted it
    # (wmAP@0.5 0.733 vs fast 0.961, docs/PERF_NOTES.md), so it must never
    # again headline off a ~1% window fluke (VERDICT r4 weak-1).
    int8_ips, int8_batch, _, _ = throughput("int8", net=int8_net,
                                            final_windows=3)
    # parity: the ONLY configuration meeting the full north-star criterion
    # (>=10k img/s AND C-output match within 1e-3) — measured at one batch
    # size (f32 activations double the HBM traffic; the bf16 sweep's best
    # batch is a reasonable operating point, not necessarily its optimum).
    try:
        parity_ips, parity_batch, _, parity_windows = throughput(
            "parity", batches=(256,), final_windows=3)
    except Exception as e:  # noqa: BLE001 — report 0 rather than lose all
        log(f"parity throughput failed: {e!r}")
        parity_ips, parity_batch, parity_windows = 0.0, 0, []
    try:
        stream_ips = throughput_stream(fast_net)
    except Exception as e:  # noqa: BLE001 — auxiliary metric, never fatal
        log(f"stream bench skipped: {e!r}")
        stream_ips = 0.0
    try:
        demo_ips = throughput_demo_geometry()
    except Exception as e:  # noqa: BLE001 — auxiliary metric, never fatal
        log(f"demo-geometry bench skipped: {e!r}")
        demo_ips = 0.0
    p50, dev_ms = latency_batch1()
    log("batch-1 latency: p50 wall %.2f ms (incl. tunnel RTT), device %.2f ms"
        % (p50, dev_ms))
    # Headline = fast, the deployable mode, as the median of its windows.
    ips, batch = fast_ips, fast_batch
    spread_pct = ((fast_windows[-1] - fast_windows[0]) / ips * 100
                  if ips else 0.0)
    import jax
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "yolo-fastest-1.1 320x320 pixels-to-boxes throughput",
        "value": round(ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / BASELINE_IMG_S, 1),
        "batch": batch,
        "p50_batch1_ms": round(p50, 2),
        "batch1_device_ms": round(dev_ms, 2),
        "mode": "fast(bf16+fp32acc)",
        "protocol": "median of %d timed windows (30 dispatches + 1 sync "
                    "each) at the sweep-winning batch" % len(fast_windows),
        "fast_img_s": round(ips, 1),   # alias of value (A/B tooling compat)
        "fast_windows_img_s": [round(v, 1) for v in fast_windows],
        "fast_window_spread_pct": round(spread_pct, 2),
        # the 1e-3-accuracy configuration's throughput (f32 + HIGHEST
        # precision; detections golden-exact per the gate above)
        "parity_img_s": round(parity_ips, 1),
        "parity_batch": parity_batch,
        "parity_windows_img_s": [round(v, 1) for v in parity_windows],
        "int8_img_s": round(int8_ips, 1),
        "int8_note": "informational only; demoted on the wide corpus "
                     "(wmAP@0.5 0.733 vs fast 0.961, docs/PERF_NOTES.md)",
        # distinct HOST batches via the pipelined detect_stream path: every
        # batch pays (overlapped) host->HBM transfer + result decode
        "stream_host_input_img_s": round(stream_ips, 1),
        # the reference's own headline workload (readme.txt:114: 67.5
        # ms/img = 14.8 img/s on its published CPU; 127 ms/img here)
        "demo_640x448_img_s": round(demo_ips, 1),
        "device": str(dev.device_kind),
        "parity": "golden detections exact (parity mode, 320x320 + 640x448)"
                  "; int8 gate: classes exact, boxes in tolerance",
    }))


if __name__ == "__main__":
    if os.environ.get("FFCNN_BENCH_CHILD") == "1":
        main()
    else:
        raise SystemExit(supervise())
