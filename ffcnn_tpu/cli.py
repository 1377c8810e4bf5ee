"""``ffcnn`` command-line demo — the reference main() (ffcnn.c:552-593)
rebuilt on the TPU pipeline.

    ffcnn detect [image.bmp] [-n ITERS] [--cfg FILE] [--weights FILE] \
                 [--mode fast|parity] [-o out.bmp]
    ffcnn dump   [--cfg FILE] [--width W] [--height H]
    ffcnn bench  [--batch N] [--size S] ...

Output format (scores, categories, int-cast rects, drawn rectangles, timing
line) matches the reference demo so the two are diffable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

DEFAULT_CFG = "/root/reference/yolo-fastest-1.1.cfg"
DEFAULT_WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"


def _add_model_args(p):
    p.add_argument("--cfg", default=DEFAULT_CFG)
    p.add_argument("--weights", default=DEFAULT_WEIGHTS)
    p.add_argument("--mode", choices=("fast", "parity", "int8"), default="parity")


def cmd_detect(args) -> int:
    from . import Net
    from .imageio.bmp import bmp_load, bmp_save, draw_rectangle

    bgr = bmp_load(args.image)
    net = Net.load(args.cfg, args.weights, bgr.shape[1], bgr.shape[0],
                   mode=args.mode)
    if args.dump:
        sys.stdout.write(net.dump())
    t0 = time.perf_counter()
    for _ in range(args.n):
        dets = net.detect(bgr)
    ms = (time.perf_counter() - t0) * 1000
    print("%d times inference: %d ms" % (args.n, int(ms)))
    for d in dets:
        print("score: %.2f, category: %2d, rect: (%3d %3d %3d %3d)"
              % (d.score, d.class_id, int(d.x1), int(d.y1),
                 int(d.x2), int(d.y2)))
        draw_rectangle(bgr, int(d.x1), int(d.y1), int(d.x2), int(d.y2),
                       0, 255, 0)
    bmp_save(args.output, bgr)
    return 0


def cmd_dump(args) -> int:
    from .darknet import dump, parse_cfg
    ir = parse_cfg(args.cfg, args.width, args.height)
    sys.stdout.write(dump(ir))
    return 0


def cmd_bench(args) -> int:
    import jax
    import jax.numpy as jnp

    batch = np.random.randint(0, 255, (args.batch, args.size, args.size, 3),
                              np.uint8)
    if args.dp and args.sp == 1:
        # Pure DP: shard_map around the net's own single-chip pipeline —
        # fused kernels + folded preprocess per shard (parallel/dp.py::
        # build_dp_pipeline; per-chip perf = the single-chip number)
        from . import Net
        from .parallel import build_dp_pipeline, make_mesh

        net = Net.load(args.cfg, args.weights, args.size, args.size,
                       mode=args.mode)
        if args.mode == "int8" and net.quant is None:
            # build_dp_pipeline wraps _pipeline_for directly, bypassing
            # detect_device's first-batch self-calibration — without a
            # plan the traced program would be the float pipeline
            # silently labeled int8.
            net.calibrate(batch[: min(8, len(batch))])
        mesh = make_mesh()
        fn = build_dp_pipeline(net, mesh, args.size, args.size)
        bj = jnp.asarray(batch)
        run = lambda: fn(bj)
        label = "dp mesh %s" % dict(mesh.shape)
    elif args.dp or args.sp > 1:
        # GSPMD mesh pipeline (parallel/dp.py): batch sharded on the data
        # axis, params replicated; --sp N additionally shards image rows
        # over a spatial axis (halo exchanges inserted by the SPMD
        # partitioner — the few-huge-images latency regime)
        from .darknet import parse_cfg, load_weights
        from .graph.build import params_to_pytree
        from .parallel import build_sharded_pipeline, make_mesh

        ir = parse_cfg(args.cfg, args.size, args.size)
        params = params_to_pytree(load_weights(ir, args.weights)[0])
        mesh = make_mesh(spatial_parallel=args.sp)
        fn, place = build_sharded_pipeline(
            ir, mesh, args.size, args.size,
            dtype=jnp.bfloat16 if args.mode == "fast" else jnp.float32)
        placed = place(params)
        mean = jnp.zeros(3, jnp.float32)
        norm = jnp.full(3, 1 / 255.0, jnp.float32)
        bj = jnp.asarray(batch)
        run = lambda: fn(placed, bj, mean, norm)
        label = "mesh %s" % dict(mesh.shape)
    else:
        from . import Net
        net = Net.load(args.cfg, args.weights, args.size, args.size,
                       mode=args.mode)
        # Device-resident input: re-uploading the numpy batch per iteration
        # measures the axon tunnel (~30 ms RTT, 78 MB/batch-256), not the
        # chip — a v8n "74 img/s" artifact in the r5c queue.  Host-input
        # throughput is tools/bench_stream.py's job.
        bj = jnp.asarray(batch)
        run = lambda: net.detect_device(bj)
        label = args.mode
    res = run()
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        res = run()
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / args.iters
    print("batch %d @%dx%d %s: %.2f ms/batch, %.0f img/s"
          % (args.batch, args.size, args.size, label, dt * 1000,
             args.batch / dt))
    return 0


def cmd_profile(args) -> int:
    from . import Net

    net = Net.load(args.cfg, args.weights, args.size, args.size,
                   mode=args.mode)
    rep = net.profile_layers(
        batch=np.zeros((args.batch, args.size, args.size, 3), np.uint8),
        iters=args.iters)
    sys.stdout.write(rep.render())
    # Stage-level roofline with the measured device times merged in
    from . import roofline
    sys.stdout.write("\n" + roofline.render(
        net.ir, net.roofline_costs(args.batch), args.batch,
        measured_us={lp.index: lp.us_per_step for lp in rep.layers}))
    m = net.memory_stats(batch_size=args.batch)
    print("memory (batch %d): peak %.1f MB  (args %.1f, temp %.1f, "
          "output %.1f, code %.1f)"
          % (args.batch, m["peak"] / 1e6, m["args"] / 1e6, m["temp"] / 1e6,
             m["output"] / 1e6, m["code"] / 1e6))
    return 0


def cmd_batch(args) -> int:
    """Batch detection over many BMPs: fixed-size chunks streamed through
    the pipelined dispatcher, so the native threaded BMP loader decodes
    chunk i+1 while the device runs chunk i (Net.detect_stream keeps two
    chunks in flight).  One compiled bucket regardless of image count."""
    from . import Net
    from .imageio.loader import load_batch

    paths = args.images
    bs = max(1, min(args.batch, len(paths)))
    probe = load_batch(paths[:1])       # dims only; the net needs a size
    net = Net.load(args.cfg, args.weights, probe.shape[2], probe.shape[1],
                   mode=args.mode, cache_dir=args.cache_dir)

    def chunks():
        for i in range(0, len(paths), bs):
            imgs = load_batch(paths[i:i + bs], args.threads)
            if imgs.shape[0] < bs:      # pad the tail into the same bucket
                pad = np.zeros((bs - imgs.shape[0],) + imgs.shape[1:],
                               np.uint8)
                imgs = np.concatenate([imgs, pad])
            yield imgs

    # timed region covers EVERY chunk's decode + detection (end to end);
    # only the one-image dims probe and the model load sit outside it
    t0 = time.perf_counter()
    results = []
    for dets in net.detect_stream(chunks(), depth=2):
        results.extend(dets)
    results = results[: len(paths)]
    ms = (time.perf_counter() - t0) * 1000
    print("%d images: %d ms (%.1f img/s)"
          % (len(results), int(ms), len(results) / (ms / 1000)))
    for path, dets in zip(paths, results):
        print(path)
        for d in dets:
            print("  score: %.2f, category: %2d, rect: (%3d %3d %3d %3d)"
                  % (d.score, d.class_id, int(d.x1), int(d.y1),
                     int(d.x2), int(d.y2)))
    return 0


def cmd_roofline(args) -> int:
    """Static HBM/MXU roofline for a cfg — no device, no weights: bytes
    moved, FLOPs, and the time floor per resolution stage (roofline.py).
    Honors the FFCNN_FUSED_* plan flags so the table reflects the plan the
    fast pipeline would actually trace."""
    from . import roofline
    from .darknet import parse_cfg

    geo = str(args.size)
    w, h = (map(int, geo.split("x")) if "x" in geo
            else (int(geo), int(geo)))
    ir = parse_cfg(args.cfg, w, h)
    runs = None
    if not args.no_fused and args.dtype == "bf16":
        from .kernels.block_fused import BATCH_QUANTUM, plan_runs
        if args.batch % BATCH_QUANTUM == 0:
            runs = plan_runs(ir)
        else:
            print(f"note: fused runs need batch %% {BATCH_QUANTUM} == 0 "
                  f"on TPU — modeling the XLA per-layer plan the pipeline "
                  f"actually traces at batch {args.batch}", file=sys.stderr)
    from .tuning import get_flag
    store = get_flag("FFCNN_FUSED_STORE", "")
    # only 'f32' is implemented by the fused kernels (net.roofline_costs)
    costs = roofline.layer_costs(
        ir, args.batch, args.dtype, fused_runs=runs,
        store_dtype=store if store == "f32" else None)
    sys.stdout.write(roofline.render(ir, costs, args.batch))
    if runs:
        print("fused runs: %s" % ", ".join(
            "L%d-%d" % (r.start, r.end) for r in runs))
    return 0


def cmd_export(args) -> int:
    from . import Net

    net = Net.load(args.cfg, args.weights, args.size, args.size,
                   mode=args.mode)
    size = None if args.size == 0 else (args.size, args.size)
    platforms = args.platforms.split(",") if args.platforms else None
    batches = [int(b) for b in str(args.batch).split(",")]
    for b in batches:
        # one artifact per batch bucket; multi-batch -> suffix .b{n}
        out = args.out if len(batches) == 1 else \
            "%s.b%d%s" % (os.path.splitext(args.out)[0], b,
                          os.path.splitext(args.out)[1])
        n = net.export(out, batch_size=b, image_size=size,
                       platforms=platforms)
        print(f"wrote {out}: {n} bytes "
              f"(batch {b}, platforms {platforms or 'current'})")
    return 0


def cmd_convert_v8(args) -> int:
    """YOLOv8 ingest (ffcnn_tpu/yolov8.py): state dict → darknet-dialect
    cfg + .weights on disk, so the model flows through every existing
    surface (detect/batch/serve/export/DP) as ordinary model files.
    Host-only: no device, no jax."""
    import torch

    from . import yolov8
    from .darknet.cfg import parse_cfg
    from .darknet.weights import load_weights

    sd = torch.load(args.sd, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        print("error: expected a plain state dict "
              "(torch.save(model.state_dict(), path))", file=sys.stderr)
        return 1
    cfg_text, wbytes = yolov8.convert(sd, args.nc, args.scale,
                                      size=args.size, conf=args.conf)
    ir = parse_cfg(cfg_text, is_path=False)
    load_weights(ir, wbytes)       # raises on any float-census mismatch
    cfg_path, w_path = args.out + ".cfg", args.out + ".weights"
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    with open(w_path, "wb") as f:
        f.write(wbytes)
    heads = sum(1 for l in ir.layers if l.type.name == "YOLOV8")
    print(f"wrote {cfg_path} ({len(ir.layers)} layers, {heads} v8 heads) "
          f"+ {w_path} ({len(wbytes)} bytes, census-validated)")
    print(f"try: ffcnn detect img.bmp --cfg {cfg_path} "
          f"--weights {w_path}")
    return 0


_JIT_COMMANDS = {"detect", "bench", "profile", "batch", "export"}


def main(argv=None) -> int:
    # The axon TPU plugin in this image ignores a JAX_PLATFORMS that was
    # already set at process spawn (it initializes the tunnel client anyway,
    # which HANGS when the tunnel is down); the config knob always wins —
    # same workaround as tests/conftest.py.
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser(prog="ffcnn", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pd = sub.add_parser("detect", help="detect objects in a BMP image")
    pd.add_argument("image", nargs="?", default="/root/reference/test.bmp")
    pd.add_argument("-n", type=int, default=1, help="inference iterations")
    pd.add_argument("-o", "--output", default="out.bmp")
    pd.add_argument("--dump", action="store_true",
                    help="print the layer table first (like the C demo)")
    _add_model_args(pd)

    pp = sub.add_parser("dump", help="print the net_dump layer table")
    pp.add_argument("--cfg", default=DEFAULT_CFG)
    pp.add_argument("--width", type=int, default=0)
    pp.add_argument("--height", type=int, default=0)

    pb = sub.add_parser("bench", help="throughput micro-benchmark")
    pb.add_argument("--batch", type=int, default=256)
    pb.add_argument("--size", type=int, default=320)
    pb.add_argument("--iters", type=int, default=10)
    pb.add_argument("--dp", action="store_true",
                    help="shard the batch over all local devices (DP mesh)")
    pb.add_argument("--sp", type=int, default=1, metavar="N",
                    help="also shard image rows over an N-way spatial mesh "
                         "axis (sequence-parallel analog; batch must divide "
                         "devices/N)")
    _add_model_args(pb)
    pb.set_defaults(mode="fast")

    pf = sub.add_parser("profile",
                        help="per-layer device-time profile (net_profile)")
    pf.add_argument("--batch", type=int, default=64)
    pf.add_argument("--size", type=int, default=320)
    pf.add_argument("--iters", type=int, default=10)
    _add_model_args(pf)
    pf.set_defaults(mode="fast")

    pe = sub.add_parser(
        "export", help="serialize a weights-baked AOT pipeline artifact")
    pe.add_argument("out", help="artifact output path")
    pe.add_argument("--batch", default="1",
                    help="batch bucket, or comma list (1,2,4 -> one "
                         "artifact per bucket, suffixed .bN)")
    pe.add_argument("--size", type=int, default=0,
                    help="incoming image size (0 = net input size)")
    pe.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. tpu)")
    _add_model_args(pe)
    pe.set_defaults(mode="fast")

    pr = sub.add_parser(
        "roofline", help="static HBM/MXU traffic + time-floor table "
                         "(no device needed)")
    pr.add_argument("--cfg", default=DEFAULT_CFG)
    pr.add_argument("--batch", type=int, default=256)
    pr.add_argument("--size", default="320",
                    help="square size or WxH (e.g. 640x448, the "
                         "reference demo geometry)")
    pr.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    pr.add_argument("--no-fused", action="store_true",
                    help="model per-layer materialization instead of the "
                         "fused-run plan")

    pm = sub.add_parser("batch", help="batch detection over many BMPs")
    pm.add_argument("images", nargs="+")
    pm.add_argument("--batch", type=int, default=64,
                    help="chunk size streamed per dispatch (loader overlaps "
                         "device compute)")
    pm.add_argument("--threads", type=int, default=0,
                    help="loader threads (0 = all cores)")
    pm.add_argument("--cache-dir", default=None,
                    help="folded-params npz cache directory")
    _add_model_args(pm)
    pm.set_defaults(mode="fast")

    pv = sub.add_parser(
        "convert-v8", help="YOLOv8 state dict -> darknet cfg + .weights "
                           "(then every other command serves the output)")
    pv.add_argument("sd", help="torch-saved PLAIN state dict "
                               "(torch.save(model.state_dict(), path))")
    pv.add_argument("-o", "--out", default="yolov8",
                    help="output basename (writes <out>.cfg + <out>.weights)")
    pv.add_argument("--nc", type=int, default=80, help="class count")
    pv.add_argument("--scale", default="n", choices=("n", "s", "m", "l", "x"))
    pv.add_argument("--size", type=int, default=640, help="net input size")
    pv.add_argument("--conf", type=float, default=0.25,
                    help="score threshold baked into the [yolov8] heads")

    args = ap.parse_args(argv)
    # Only device-touching commands pay JAX startup + compile-cache setup;
    # `dump` stays a pure host-side cfg parse.
    if args.cmd in _JIT_COMMANDS and \
            os.environ.get("FFCNN_NO_COMPILE_CACHE") != "1":
        from . import enable_compile_cache
        enable_compile_cache()
    return {"detect": cmd_detect, "dump": cmd_dump, "bench": cmd_bench,
            "profile": cmd_profile, "batch": cmd_batch,
            "export": cmd_export, "roofline": cmd_roofline,
            "convert-v8": cmd_convert_v8}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
