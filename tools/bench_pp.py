#!/usr/bin/env python
"""Pipeline-parallelism timing characterization (VERDICT r3 #8).

parallel/pp.py ships with a verified schedule (S + M - 1 ticks, GPipe)
but, until this tool, no *measured* characterization — its "DP strictly
dominates at darknet scale" claim was asserted, not shown.  This measures
three things on the simulated 8-device CPU mesh (the same mesh the PP
equivalence tests use, so no TPU time is burned on a capability the
flagship doesn't need):

  1. **Schedule validation**: wall time of a (S=4, data=2) pipeline step
     at M in {4, 8, 16} microbatches.  The GPipe schedule predicts
     T(M) = (S + M - 1) * t_tick + c; a linear fit over M recovers t_tick
     and the implied tick count, which must match S + M - 1 (not M, not
     S * M).
  2. **Bubble fraction**: per-image efficiency of M=16 vs M=4 — the
     schedule predicts throughput scaling by (S+4-1)/(S+16-1) * 4, i.e.
     the bubble amortizes with M.
  3. **DP-vs-PP on equal devices**: the same f32 pixels-to-boxes program
     data-sharded over all 8 devices vs the (data=2, pipe=4) pipeline at
     the same images/step.  This is the number behind "DP strictly
     dominates for darknet-scale models" (no bubble, no wire traffic).

CPU-mesh timings are rough (host threads, no ICI) — they validate the
*schedule arithmetic*, not absolute device performance.  Usage:

    /opt/venv/bin/python tools/bench_pp.py [--size 160] [--mb 8]
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("FFCNN_TUNED_DEFAULTS", "")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                           # noqa: E402
jax.config.update("jax_platforms", "cpu")            # axon plugin gotcha
import jax.numpy as jnp                              # noqa: E402
import numpy as np                                   # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from ffcnn_tpu.darknet import load_weights, parse_cfg       # noqa: E402
from ffcnn_tpu.darknet.ir import LayerType                  # noqa: E402
from ffcnn_tpu.graph.build import (forward_features,        # noqa: E402
                                   params_to_pytree)
from ffcnn_tpu.ops.nms import nms                           # noqa: E402
from ffcnn_tpu.ops.preprocess import letterbox, letterbox_params  # noqa: E402
from ffcnn_tpu.ops.yolo import (apply_arena_cap, arena_capacity,  # noqa: E402
                                concat_heads, decode_head)
from ffcnn_tpu.parallel import (build_pp_pipeline, make_mesh,     # noqa: E402
                                plan_stages)
from ffcnn_tpu.parallel.mesh import DATA_AXIS               # noqa: E402

REFERENCE = "/root/reference"
TOPK = 64


def _block(res):
    jax.tree.map(lambda a: a.block_until_ready(), res)


def _time(fn, xs, iters):
    """xs: one DISTINCT input per iteration (xs[-1] warms the compile).
    Repeated identical dispatches undercount wildly on this stack
    (CLAUDE.md measurement protocol) — every timed call gets its own
    input."""
    _block(fn(xs[-1]))                               # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        _block(fn(xs[i % len(xs)]))
    return (time.perf_counter() - t0) / iters


def _variants(rng, n, shape):
    return [jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
            for _ in range(n)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160,
                    help="square net input (ALIGN-32)")
    ap.add_argument("--mb", type=int, default=8,
                    help="images per microbatch (split over data axis)")
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    ir = parse_cfg(os.path.join(REFERENCE, "yolo-fastest-1.1.cfg"),
                   args.size, args.size)
    raw, _ = load_weights(ir, os.path.join(REFERENCE,
                                           "yolo-fastest-1.1.weights"))
    params = params_to_pytree(raw)
    S, mb = args.stages, args.mb
    rng = np.random.default_rng(0)

    # -- PP: T(M) over the microbatch count ------------------------------
    mesh_pp = make_mesh(pipeline_parallel=S)         # (data=2, pipe=4)
    stages = plan_stages(ir, S, dtype="f32")
    wire = max(sum(ir.blobs[b].numel() for b in st.live_out)
               for st in stages)
    rows = []
    for M in (4, 8, 16):
        run = build_pp_pipeline(ir, params, mesh_pp, args.size, args.size,
                                n_microbatches=M, topk=TOPK)
        imgs = _variants(rng, args.iters,
                         (M * mb, args.size, args.size, 3))
        t = _time(run, imgs, args.iters)
        rows.append((M, t))
        print(f"PP S={S} M={M:2d}: {t * 1e3:8.1f} ms/step  "
              f"({M * mb / t:7.1f} img/s)", flush=True)

    # linear fit T(M) = a*M + b  =>  t_tick = a, implied ticks = T/a
    Ms = np.array([r[0] for r in rows], dtype=np.float64)
    Ts = np.array([r[1] for r in rows], dtype=np.float64)
    a, b = np.polyfit(Ms, Ts, 1)
    implied = Ts / a
    sched = Ms + S - 1
    print(f"t_tick (fit slope) = {a * 1e3:.1f} ms; fixed = {b * 1e3:.1f} ms")
    for M, imp, sc in zip(Ms, implied, sched):
        print(f"  M={int(M):2d}: implied ticks {imp:5.1f}  vs  "
              f"schedule S+M-1 = {int(sc)}")
    bubble = {int(M): (S - 1) / (S + M - 1) for M in Ms}

    # -- DP on the same 8 devices, same images/step as the M=8 PP row ----
    mesh_dp = make_mesh()                            # (data=8,)
    net_w = net_h = args.size
    _, _, s1, s2 = letterbox_params(net_w, net_h, net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLO]

    def one_prog(bgr):
        x = letterbox(bgr, net_w, net_h, dtype=jnp.float32)
        feats = forward_features(ir, params, x)
        d = concat_heads([decode_head(f, l, net_w, net_h)
                          for f, l in zip(feats, heads_meta)])
        d = apply_arena_cap(d, arena_capacity(net_w, net_h, ir.blobs[0].c))
        return nms(d.boxes, d.scores, d.classes, k=TOPK, threshold=0.5,
                   scale1=s1, scale2=s2)

    dp_spec = NamedSharding(mesh_dp, P(DATA_AXIS))
    dp_run = jax.jit(one_prog, in_shardings=dp_spec)
    n_imgs = 8 * mb
    imgs = _variants(rng, args.iters,
                     (n_imgs, args.size, args.size, 3))
    t_dp = _time(dp_run, imgs, args.iters)
    t_pp8 = dict(rows)[8]
    print(f"DP  8 devices      : {t_dp * 1e3:8.1f} ms/step  "
          f"({n_imgs / t_dp:7.1f} img/s)  [{n_imgs} imgs]")
    print(f"PP (S=4,data=2) M=8: {t_pp8 * 1e3:8.1f} ms/step  "
          f"({8 * mb / t_pp8:7.1f} img/s)  [{8 * mb} imgs]")

    print(json.dumps({
        "mesh": "8-device CPU sim", "size": args.size, "S": S, "mb": mb,
        "pp_ms_per_step": {int(M): round(t * 1e3, 1) for M, t in rows},
        "t_tick_ms": round(a * 1e3, 2), "fixed_ms": round(b * 1e3, 2),
        "implied_ticks": [round(x, 1) for x in implied],
        "schedule_ticks": [int(x) for x in sched],
        "bubble_fraction": bubble,
        "wire_floats_per_mb": wire,
        "dp8_img_s": round(n_imgs / t_dp, 1),
        "pp_m8_img_s": round(8 * mb / t_pp8, 1),
        "dp_over_pp": round(t_pp8 / t_dp, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
