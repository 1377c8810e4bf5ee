#!/usr/bin/env python
"""Real-chip PP stage-body timing (VERDICT r4 #7).

parallel/pp.py's characterization is CPU-sim only; its claim that "on real
TPU DP additionally runs the fused single-chip program PP stage bodies
don't" was an inference.  This runs the pipeline's OWN stage bodies — the
same ``lax.switch`` branch structure build_pp_pipeline traces, with the
same pack/unpack wire-buffer marshalling — on ONE real device, one stage
index at a time, and reports:

  * per-stage device-step time (iterations chained through a
    ``lax.fori_loop`` data dependency — repeated identical dispatches
    undercount wildly on this stack, CLAUDE.md measurement protocol);
  * their sum vs the monolithic same-dtype (f32, no fused runs) program:
    the cost of cutting the graph (boundary blob materialization +
    pack/unpack), with ppermute wire time necessarily excluded
    (single device);
  * the monolith vs the PRODUCTION fast-mode program: the fused-Pallas +
    bf16 advantage a DP deployment keeps and PP stage bodies give up;
  * the wire-buffer width (bytes/microbatch) each boundary ships.

    /opt/venv/bin/python tools/pp_stage_device.py [--size 320] [--mb 32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
import numpy as np                                   # noqa: E402
from jax import lax                                  # noqa: E402

from ffcnn_tpu.darknet import load_weights, parse_cfg       # noqa: E402
from ffcnn_tpu.darknet.ir import LayerType                  # noqa: E402
from ffcnn_tpu.graph.build import (forward_features,        # noqa: E402
                                   params_to_pytree)
from ffcnn_tpu.ops.nms import nms                           # noqa: E402
from ffcnn_tpu.ops.preprocess import letterbox, letterbox_params  # noqa: E402
from ffcnn_tpu.ops.yolo import (apply_arena_cap, arena_capacity,  # noqa: E402
                                concat_heads, decode_head)
from ffcnn_tpu.parallel.pp import (_pack, _unpack, _wire_floats,  # noqa: E402
                                   plan_stages)

REFERENCE = "/root/reference"
TOPK = 64


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--mb", type=int, default=32,
                    help="images per microbatch")
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default="device",
                    choices=("device", "cpu"),
                    help="cpu = offline smoke (numbers meaningless)")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")   # axon plugin gotcha
    from ffcnn_tpu import enable_compile_cache
    enable_compile_cache()

    ir = parse_cfg(os.path.join(REFERENCE, "yolo-fastest-1.1.cfg"),
                   args.size, args.size)
    raw, _ = load_weights(ir, os.path.join(REFERENCE,
                                           "yolo-fastest-1.1.weights"))
    params = params_to_pytree(raw)
    S, mb = args.stages, args.mb
    dtype = jnp.float32
    net_w = net_h = args.size
    _, _, s1, s2 = letterbox_params(net_w, net_h, net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLO]
    stages = plan_stages(ir, S, dtype="f32")
    width = max(_wire_floats(ir, st.live_out) for st in stages)
    wire_bytes = [4 * _wire_floats(ir, st.live_out) * mb for st in stages]

    # The exact stage-body functions build_pp_pipeline's lax.switch traces
    # (parallel/pp.py mk_stage), minus the mesh collectives.
    def mk_stage(s):
        st = stages[s]

        def fn(buf, imgs_t):
            if s == 0:
                x = letterbox(imgs_t, net_w, net_h, dtype=dtype)
                heads, out = forward_features(
                    ir, params, x, input_dtype=dtype,
                    start=0, stop=st.stop, keep_blobs=list(st.live_out))
            else:
                blobs_in = _unpack(buf, st.live_in, ir, imgs_t.shape[0],
                                   dtype)
                heads, out = forward_features(
                    ir, params, None, input_dtype=dtype,
                    start=st.start, stop=st.stop,
                    blobs_in=blobs_in, keep_blobs=list(st.live_out))
            if s == S - 1:
                d = concat_heads([
                    decode_head(f.astype(jnp.float32), l, net_w, net_h)
                    for f, l in zip(heads, heads_meta)])
                d = apply_arena_cap(
                    d, arena_capacity(net_w, net_h, ir.blobs[0].c))
                res = nms(d.boxes, d.scores, d.classes, k=TOPK,
                          threshold=0.5, scale1=s1, scale2=s2)
                # fold a result scalar into the carry so the fori_loop
                # chain has a data dependency through the last stage too
                return jnp.zeros((imgs_t.shape[0], width), dtype) \
                    .at[0, 0].set(res.scores[0, 0].astype(dtype)), res
            return _pack(out, st.live_out, imgs_t.shape[0], width,
                         dtype), None

        return fn

    branches = [mk_stage(s) for s in range(S)]

    @jax.jit
    def chain(sidx, buf0, imgs, iters):
        # lax.switch branches must return identical pytrees; wrap to keep
        # only the wire buffer (the second element is None vs NMSResult —
        # the last stage folds a result scalar into its buffer above, so
        # no branch's work is dead).
        def body(i, buf):
            # thread the carry through the input so iteration i+1 cannot
            # start before i finishes (x*0 is NOT folded for floats)
            im = imgs + (buf[0, 0] * 0).astype(imgs.dtype)
            return lax.switch(sidx,
                              [lambda b, t, f=f: f(b, t)[0]
                               for f in branches], buf, im)

        return lax.fori_loop(0, iters, body, buf0)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (mb, args.size, args.size, 3),
                                    dtype=np.uint8))
    buf0 = jnp.zeros((mb, width), dtype)
    per_stage_ms = []
    for s in range(S):
        sidx = jnp.int32(s)
        jax.block_until_ready(chain(sidx, buf0, imgs, 1))       # compile
        t0 = time.perf_counter()
        jax.block_until_ready(chain(sidx, buf0, imgs, args.iters))
        t = (time.perf_counter() - t0) / args.iters
        per_stage_ms.append(t * 1e3)
        st = stages[s]
        print(f"stage {s} [{st.start:3d},{st.stop:3d}): "
              f"{t * 1e3:7.2f} ms/tick  wire {wire_bytes[s] / 1e6:.2f} MB",
              flush=True)

    # monolith: same dtype, same XLA path (no fused runs), whole graph
    def mono(imgs_t, seed):
        im = imgs_t + (seed * 0).astype(imgs_t.dtype)
        x = letterbox(im, net_w, net_h, dtype=dtype)
        heads = forward_features(ir, params, x, input_dtype=dtype)
        d = concat_heads([decode_head(f.astype(jnp.float32), l,
                                      net_w, net_h)
                          for f, l in zip(heads, heads_meta)])
        d = apply_arena_cap(d, arena_capacity(net_w, net_h, ir.blobs[0].c))
        return nms(d.boxes, d.scores, d.classes, k=TOPK, threshold=0.5,
                   scale1=s1, scale2=s2)

    @jax.jit
    def mono_chain(imgs_t, iters):
        def body(i, seed):
            return mono(imgs_t, seed).scores[0, 0]
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    jax.block_until_ready(mono_chain(imgs, 1))
    t0 = time.perf_counter()
    jax.block_until_ready(mono_chain(imgs, args.iters))
    mono_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"monolith f32 (same path, uncut): {mono_ms:7.2f} ms", flush=True)

    # production fast-mode program at the same image count (fused Pallas
    # engages only at lane-aligned batches; mb here is below that, so this
    # is the honest same-batch comparison, not the headline batch-256 one)
    from ffcnn_tpu import Net
    net = Net.load(os.path.join(REFERENCE, "yolo-fastest-1.1.cfg"),
                   os.path.join(REFERENCE, "yolo-fastest-1.1.weights"),
                   args.size, args.size, mode="fast", topk=TOPK)
    jax.block_until_ready(net.detect_device(np.asarray(imgs)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = net.detect_device(np.asarray(imgs))
    jax.block_until_ready(r)
    fast_ms = (time.perf_counter() - t0) / args.iters * 1e3

    total = sum(per_stage_ms)
    print(f"sum(stage bodies) {total:7.2f} ms  vs monolith {mono_ms:7.2f} "
          f"ms  ({(total / mono_ms - 1) * 100:+.1f}% cut overhead, wire "
          f"time excluded)")
    print(f"production fast-mode same batch: {fast_ms:7.2f} ms", flush=True)
    print(json.dumps({
        "device": str(jax.devices()[0].device_kind),
        "size": args.size, "mb": mb, "S": S, "iters": args.iters,
        "stage_ms": [round(v, 3) for v in per_stage_ms],
        "stage_bounds": [[st.start, st.stop] for st in stages],
        "wire_bytes_per_mb": wire_bytes,
        "sum_stage_ms": round(total, 3),
        "monolith_f32_ms": round(mono_ms, 3),
        "cut_overhead_pct": round((total / mono_ms - 1) * 100, 2),
        "fast_mode_ms": round(fast_ms, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
