#!/usr/bin/env python
"""Per-stage HBM traffic model for the flagship net (VERDICT r3 #1/#3).

Computes, from the IR alone, the bytes each execution strategy must move
per batch, with the REAL TPU tiling rules applied per dtype:

  * bf16 stores tile sublanes to 16  -> a C-channel blob occupies
    ceil(C/16)*16 sublanes x 2 B
  * f32 tiles sublanes to 8          -> ceil(C/8)*8 x 4 B
  * int8 tiles to 32                 -> ceil(C/32)*32 x 1 B

(lane dim is spatial*batch here — always large, ignore its padding).

Strategies modeled:
  xla      — per-layer materialization with XLA's measured 1-deep conv
             input-fusion (each inverted-residual block eliminates ONE of
             its two expand intermediates; docs/PERF_NOTES.md r2).
             CAVEAT: this column applies the sublane-tiling pad to XLA
             blobs too, which is PESSIMISTIC at small C — XLA picks its
             own conv layouts (batch-in-lanes etc.), so compare the
             column's SHAPE across stages, not its absolute floor; the
             trustworthy absolutes are the measured per-stage device
             times (PERF_NOTES 'Where the 6.8 ms goes')
  fused    — per-block Pallas runs: expand intermediates never touch HBM;
             block boundary blobs round-trip in the given storage dtype
  region   — stage-spanning runs (FFCNN_FUSED_DOWN): same as fused, but
             boundary blobs between stages also stay in fused layout (no
             NHWC transposes; same bytes, fewer relayouts)

The time floor divides by the measured effective HBM bandwidth
(~665 GB/s on this v5e through XLA — PERF_NOTES 'add1 calibration').

    /opt/venv/bin/python tools/traffic_model.py [--size 320] [--batch 256]
"""
import argparse
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ffcnn_tpu.darknet import parse_cfg                     # noqa: E402
from ffcnn_tpu.darknet.ir import LayerType                  # noqa: E402
from ffcnn_tpu.kernels.block_fused import find_fused_blocks  # noqa: E402

HBM_GBPS = 665.0


def padded_bytes(w, h, c, batch, dtype):
    tile, bpe = {"bf16": (16, 2), "f32": (8, 4), "int8": (32, 1)}[dtype]
    c_pad = -(-c // tile) * tile
    return w * h * c_pad * bpe * batch


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bf16",
                    choices=("bf16", "f32", "int8"))
    args = ap.parse_args(argv)

    ir = parse_cfg("/root/reference/yolo-fastest-1.1.cfg",
                   args.size, args.size)
    blocks = find_fused_blocks(ir)
    in_block = {}
    for s, b in blocks.items():
        for li in range(b.start, b.end + 1):
            in_block[li] = b

    # Stage key = spatial dims of the layer's input blob.
    def stage_of(li):
        b = ir.blobs[li]
        return (b.w, b.h)

    xla = defaultdict(float)
    fused = defaultdict(float)
    n = args.batch

    def blob_bytes(bi, dtype=None):
        b = ir.blobs[bi]
        return padded_bytes(b.w, b.h, b.c, n, dtype or args.dtype)

    for li, l in enumerate(ir.layers):
        if l.type not in (LayerType.CONV, LayerType.MAXPOOL,
                          LayerType.AVGPOOL, LayerType.UPSAMPLE,
                          LayerType.SHORTCUT, LayerType.ROUTE):
            continue
        st = stage_of(li)
        reads = blob_bytes(li)
        writes = blob_bytes(li + 1) if ir.blobs[li + 1].c else 0
        if l.type == LayerType.SHORTCUT:
            reads += blob_bytes(l.depends[0] + 1)
        if l.type == LayerType.ROUTE:
            reads = sum(blob_bytes(d + 1) for d in l.depends)
        # XLA 1-deep conv input fusion: the dw3x3 inlines its producer pw,
        # so the FIRST expand intermediate of each block is never written
        # or read (2 transfers saved); model: skip the dw's read and the
        # expand's write.
        b = in_block.get(li)
        if b is not None and l.type == LayerType.CONV:
            pos = li - b.start
            if pos == 0:
                xla[st] += reads          # expand reads block input, write fused away
                continue
            if pos == 1:
                xla[st] += writes         # dw writes its output, read fused away
                continue
        xla[st] += reads + writes

        # fused model: only block inputs/outputs move; interior never does.
        if b is not None:
            if li == b.start:
                fused[st] += blob_bytes(b.start)
            if li == b.end:
                fused[st] += blob_bytes(b.end + 1)
        else:
            fused[st] += reads + writes

    print(f"{'stage':>10} | {'xla(1-deep) MB':>14} {'floor ms':>9} | "
          f"{'fused MB':>9} {'floor ms':>9}   [batch {n}, {args.dtype}, "
          f"{HBM_GBPS:.0f} GB/s]")
    tot_x = tot_f = 0.0
    for st in sorted(xla, key=lambda s: -s[0] * s[1]):
        x, f = xla[st] / 1e6, fused.get(st, 0.0) / 1e6
        tot_x += x
        tot_f += f
        print(f"{st[0]:>4}x{st[1]:<5} | {x:14.1f} {x / HBM_GBPS:9.3f} | "
              f"{f:9.1f} {f / HBM_GBPS:9.3f}")
    print(f"{'TOTAL':>10} | {tot_x:14.1f} {tot_x / HBM_GBPS:9.3f} | "
          f"{tot_f:9.1f} {tot_f / HBM_GBPS:9.3f}")

    # int8 vs bf16 storage per C (the (32,128)-tiling argument):
    print("\nper-channel-count storage bytes/column (sublane tiling):")
    print(f"{'C':>4} {'bf16':>6} {'f32':>6} {'int8':>6}   int8 wins?")
    for c in (3, 4, 8, 16, 24, 32, 48, 96, 136, 224):
        bb = -(-c // 16) * 16 * 2
        ff = -(-c // 8) * 8 * 4
        ii = -(-c // 32) * 32 * 1
        print(f"{c:>4} {bb:>6} {ff:>6} {ii:>6}   "
              f"{'YES' if ii < min(bb, ff) else 'no'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
