#!/usr/bin/env python
"""Bisect WHY the fused (H, C, W*N) Pallas block kernels lose at C<=16.

VERDICT r3 weak#1 / next#2: two rounds of measured losses at the small-C
geometries (r2 per-block 0.89x/0.68x vs XLA; r3 regions -5..-8.5% in-net)
with no in-kernel attribution.  This tool times VARIANTS of the fused
block kernel that peel off one component at a time, so the gap to the
XLA chain and to the HBM roofline gets a name:

  copy     load the same halo BlockSpecs, store the center rows
           -> pure memory streaming rate through this grid structure
  dwonly   taps on the loaded rows directly (E=C, no MXU dots)
           -> tap arithmetic + streaming
  pwonly   pw-expand -> pw-project per row (no taps)
           -> small-sublane dot_general rate + streaming
  full     the production kernel body (_make_kernel semantics)
  xla      the same block as three conv2d_fused calls (XLA baseline)
  tpose    NHWC -> (H, C, W*N) -> NHWC round-trip alone (the layout
           tax apply_run pays once per run)

All variants are CHAINED through ``lax.fori_loop`` with data dependencies
(docs/PERF_NOTES.md measurement protocol: repeated identical dispatches
undercount wildly) and timed by profiler device time (tools/devtime.py).
Shapes keep P=C so each variant's output feeds its next iteration.

Geometries default to the three losing stages of yolo-fastest-1.1 at
320x320 (160x160/C8/E32, 80x80/C8/E48, 40x40/C16/E96) plus the winning
20x20/C24/E136 as a control.  Reference for the block semantics:
conv-v6.c:46-229 (pw/dw fast paths); the fused-region floors this kernel
chases are in docs/PERF_NOTES.md r3 session 1.

    /opt/venv/bin/python tools/bisect_smallc.py [--batch 256] [--iters 20]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from devtime import device_ms
from ffcnn_tpu.darknet.ir import Activation
from ffcnn_tpu.kernels.block_fused import _pick_rows
from ffcnn_tpu.ops.activations import activate
from ffcnn_tpu.ops.conv import conv2d_fused

LEAKY = int(Activation.LEAKY)
LINEAR = int(Activation.LINEAR)

# (label, H, W, C, E) — the r2/r3 losers + the measured winner as control.
GEOMS = [
    ("160x160/C8/E32", 160, 160, 8, 32),
    ("80x80/C8/E48", 80, 80, 8, 48),
    ("40x40/C16/E96", 40, 40, 16, 96),
    ("20x20/C24/E136", 20, 20, 24, 136),
]


def make_variant_kernel(mode, rows, width, n, e):
    """One grid step: (R+2) halo rows in, R rows out, P=C.  Mirrors
    kernels/block_fused.py::_make_kernel's structure with components
    peeled per ``mode``."""
    R, W, N = rows, width, n

    def kern(xt, xc, xb, w1, s1, b1, kdw, s2, b2, w2, s3, b3, o_ref):
        h = pl.program_id(0)
        nh = pl.num_programs(0)
        S = W * N
        # bf16-tap probe modes keep the loaded rows in their storage dtype
        # (bf16 by default) so the tap stage's Mosaic-managed VMEM
        # spill/reload traffic is 16-bit; everything else lifts to f32 at
        # the door like the production kernel (_make_kernel).
        keep_raw = mode in ("dwmixed", "dwbf16", "fullbf16")
        lift = (lambda a: a) if keep_raw \
            else (lambda a: a.astype(jnp.float32))
        src = [lift(xt[0])] + [lift(xc[r]) for r in range(R)] \
            + [lift(xb[0])]
        if mode == "copy":
            o_ref[...] = jnp.stack(src[1:R + 1]).astype(o_ref.dtype)
            return
        if mode in ("dwonly", "dwmixed", "dwbf16"):
            # taps on the raw rows (E=C): isolates tap arithmetic.
            #   dwonly   f32 rows x f32 per-channel broadcast (production)
            #   dwmixed  bf16 rows x f32 broadcast -> f32 FMA (promotion):
            #            halves the row traffic, same ALU
            #   dwbf16   bf16 rows x bf16 broadcast -> bf16 FMA: probes
            #            both 16-bit VPU rate AND the Mosaic minor-dim
            #            broadcast 32-bit-only limit
            c_here = src[0].shape[0]
            h1 = []
            for idx, a in enumerate(src):
                if idx == 0:
                    a = jnp.where(h == 0, 0.0, a)
                if idx == R + 1:
                    a = jnp.where(h == nh - 1, 0.0, a)
                h1.append(jnp.pad(a, ((0, 0), (N, N))))
            outs = []
            for r in range(R):
                acc = jnp.zeros(
                    (c_here, S),
                    jnp.bfloat16 if mode == "dwbf16" else jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        k = kdw[dy, dx][:c_here, None]
                        if mode == "dwbf16":
                            k = k.astype(jnp.bfloat16)
                        acc = acc + (h1[r + dy][:, dx * N: dx * N + S] * k)
                outs.append(activate(acc, LEAKY))
            o_ref[...] = jnp.stack(outs).astype(o_ref.dtype)
            return
        # pw-expand on every row (pwonly skips the taps; full applies them).
        # fullbf16: bf16 dot operands (f32 accumulation preserved via
        # preferred_element_type) + bf16 expand rows through the tap stage
        # (mixed bf16 x f32-broadcast FMA) — the whole-block version of
        # dwmixed's traffic halving.
        bf = mode == "fullbf16"
        w1k = w1[...].astype(jnp.bfloat16) if bf else w1[...]
        rows_ = [activate(lax.dot_general(
                     w1k, xr, (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32) * s1[...]
                     + b1[...], LEAKY)
                 for xr in src]
        if mode == "pwonly":
            mids = rows_[1:R + 1]
        else:                                   # full / fullbf16
            h1 = []
            for idx, a in enumerate(rows_):
                if idx == 0:
                    a = jnp.where(h == 0, 0.0, a)
                if idx == R + 1:
                    a = jnp.where(h == nh - 1, 0.0, a)
                if bf:
                    a = a.astype(jnp.bfloat16)
                h1.append(jnp.pad(a, ((0, 0), (N, N))))
            mids = []
            for r in range(R):
                acc = jnp.zeros((e, S), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        acc = acc + (h1[r + dy][:, dx * N: dx * N + S]
                                     * kdw[dy, dx][:, None])
                mids.append(activate(acc * s2[...] + b2[...], LEAKY))
        w2k = w2[...].astype(jnp.bfloat16) if bf else w2[...]
        outs = []
        for r in range(R):
            m = mids[r].astype(jnp.bfloat16) if bf else mids[r]
            y = lax.dot_general(w2k, m, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            y = activate(y * s3[...] + b3[...], LINEAR)
            y = activate(y + src[r + 1].astype(jnp.float32), LINEAR)
            outs.append(y)                             # residual keeps P=C
        o_ref[...] = jnp.stack(outs).astype(o_ref.dtype)

    return kern


def variant_step(mode, hh, width, n, c, e, params9, dtype):
    """(H, C, W*N) -> (H, C, W*N) single block step for chaining."""
    s = width * n
    r = _pick_rows(hh, c if mode in ("copy", "dwonly", "dwmixed", "dwbf16")
                   else e, s)
    kern = make_variant_kernel(mode, r, width, n, e)
    top = pl.BlockSpec((1, c, s),
                       lambda i: (jnp.maximum(i * r - 1, 0), 0, 0),
                       memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((r, c, s), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, c, s),
                       lambda i: (jnp.minimum((i + 1) * r, hh - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def step(x):
        return pl.pallas_call(
            kern, grid=(hh // r,),
            in_specs=[top, cur, bot] + [full()] * 9,
            out_specs=pl.BlockSpec((r, c, s), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hh, c, s), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=os.environ.get("BISECT_INTERPRET", "0") == "1",
        )(x, x, x, *params9)

    return step


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20,
                    help="fori_loop chain length inside one dispatch")
    ap.add_argument("--store", choices=("bf16", "f32"), default="bf16")
    ap.add_argument("--geoms", nargs="*", default=None)
    ap.add_argument("--modes", nargs="*", default=None,
                    help="subset of copy dwonly dwmixed dwbf16 pwonly "
                         "full fullbf16 (default: all)")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args(argv)

    n = args.batch
    dtype = jnp.bfloat16 if args.store == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    results = []
    for label, hh, width, c, e in GEOMS:
        if args.geoms and label not in args.geoms:
            continue
        s = width * n
        x0 = jnp.asarray(rng.randn(hh, c, s).astype(np.float32) * 0.25,
                         dtype)
        mk = lambda *sh: jnp.asarray(
            rng.randn(*sh).astype(np.float32) * 0.2)
        col = lambda m: jnp.asarray(
            (rng.rand(m, 1).astype(np.float32) * 0.5 + 0.5))
        params9 = (mk(e, c), col(e), col(e), mk(3, 3, e), col(e), col(e),
                   mk(c, e), col(c), col(c))
        # dense + tile-padded HBM bytes per step (in + out), for BW math
        tile = 16 if args.store == "bf16" else 8
        bpe = 2 if args.store == "bf16" else 4
        dense_mb = 2 * hh * c * s * bpe / 1e6
        padded_c = -(-c // tile) * tile
        padded_mb = 2 * hh * padded_c * s * bpe / 1e6
        row = {"geom": label, "batch": n, "store": args.store,
               "dense_MB": round(dense_mb, 1),
               "tiled_MB": round(padded_mb, 1)}
        print(f"--- {label} batch {n} store {args.store} "
              f"(stream {dense_mb:.0f} MB dense / {padded_mb:.0f} MB tiled)",
              flush=True)

        for mode in (args.modes or ("copy", "dwonly", "dwmixed", "dwbf16",
                                    "pwonly", "full", "fullbf16")):
            step = variant_step(mode, hh, width, n, c, e, params9, dtype)
            chained = jax.jit(lambda x, step=step: lax.fori_loop(
                0, args.iters, lambda i, v: step(v), x))
            try:
                ms = device_ms(chained, x0, iters=1) / args.iters
            except Exception as ex:
                row[mode] = f"FAIL {type(ex).__name__}"
                print(f"  {mode:7s} FAIL {type(ex).__name__}: {ex}",
                      flush=True)
                continue
            bw = padded_mb / 1e3 / ms if ms else 0
            row[mode] = round(ms * 1e3, 1)
            print(f"  {mode:7s} {ms * 1e3:7.1f} us/block  "
                  f"({bw:5.0f} GB/s tiled)", flush=True)

        # XLA chain baseline (NHWC, same block, residual)
        w1x = params9[0].T[None, None].astype(dtype)       # (1,1,C,E)
        wdx = jnp.transpose(params9[3], (0, 1, 2))[:, :, None, :]\
            .astype(dtype)
        w2x = params9[6].T[None, None].astype(dtype)       # (1,1,E,C)
        sb = [jnp.squeeze(params9[i], -1) for i in (1, 2, 4, 5, 7, 8)]

        def xla_block(xh):
            y = conv2d_fused(xh, w1x, sb[0], sb[1], stride=1, pad=0,
                             groups=1, act=LEAKY)
            y = conv2d_fused(y, wdx, sb[2], sb[3], stride=1, pad=1,
                             groups=e, act=LEAKY)
            y = conv2d_fused(y, w2x, sb[4], sb[5], stride=1, pad=0,
                             groups=1, act=LINEAR)
            return (y + xh).astype(dtype)

        xh0 = jnp.asarray(rng.randn(n, hh, width, c).astype(np.float32)
                          * 0.25, dtype)
        chained_x = jax.jit(lambda x: lax.fori_loop(
            0, args.iters, lambda i, v: xla_block(v), x))
        ms = device_ms(chained_x, xh0, iters=1) / args.iters
        row["xla"] = round(ms * 1e3, 1)
        print(f"  xla     {ms * 1e3:7.1f} us/block", flush=True)

        # layout round-trip alone (chained with a data dependency)
        def tpose(xh):
            xc = jnp.transpose(xh, (1, 3, 2, 0)).reshape(hh, c, width * n)
            xc = xc + jnp.asarray(1, dtype)
            return jnp.transpose(xc.reshape(hh, c, width, n),
                                 (3, 0, 2, 1))

        chained_t = jax.jit(lambda x: lax.fori_loop(
            0, args.iters, lambda i, v: tpose(v), x))
        ms = device_ms(chained_t, xh0, iters=1) / args.iters
        row["tpose"] = round(ms * 1e3, 1)
        print(f"  tpose   {ms * 1e3:7.1f} us/round-trip", flush=True)
        results.append(row)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
