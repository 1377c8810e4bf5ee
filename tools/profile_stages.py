#!/usr/bin/env python
"""Stage-level timing of the fast pipeline on the real chip.

Times each stage (letterbox / forward / decode / nms) as its own jitted
program, plus the fused whole-pipeline program, to locate the bottleneck.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ffcnn_tpu import Net
from ffcnn_tpu.darknet.ir import LayerType
from ffcnn_tpu.graph.build import forward_features
from ffcnn_tpu.ops.nms import nms
from ffcnn_tpu.ops.preprocess import letterbox, letterbox_params
from ffcnn_tpu.ops.yolo import concat_heads, decode_head

CFG = "/root/reference/yolo-fastest-1.1.cfg"
WEIGHTS = "/root/reference/yolo-fastest-1.1.weights"
SIZE = int(os.environ.get("SIZE", "320"))
BATCH = int(os.environ.get("BATCH", "256"))
ITERS = 30


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1000, out


def main():
    net = Net.load(CFG, WEIGHTS, mode="fast")
    ir = net.ir
    net_w, net_h = ir.blobs[0].w, ir.blobs[0].h
    _, _, s1, s2 = letterbox_params(SIZE, SIZE, net_w, net_h)
    heads_meta = [l for l in ir.layers if l.type == LayerType.YOLO]
    mean = jnp.zeros(3, jnp.float32)
    norm = jnp.full(3, 1 / 255.0, jnp.float32)

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.uint8))

    lb = jax.jit(lambda b: letterbox(b, net_w, net_h, mean, norm, dtype=jnp.bfloat16))
    t_lb, x = bench(lb, batch)

    fwd = jax.jit(lambda p, x: forward_features(ir, p, x))
    t_fwd, feats = bench(fwd, net.params, x)

    dec = jax.jit(lambda fs: concat_heads([
        decode_head(f.astype(jnp.float32), l, net_w, net_h)
        for f, l in zip(fs, heads_meta)]))
    t_dec, d = bench(dec, feats)

    nm = jax.jit(lambda d: nms(d.boxes, d.scores, d.classes, k=128,
                               threshold=0.5, scale1=s1, scale2=s2))
    t_nms, _ = bench(nm, d)

    t_all, _ = bench(lambda b: net.detect_device(b), batch)

    print(f"batch={BATCH} size={SIZE}")
    print(f"letterbox : {t_lb:7.3f} ms")
    print(f"forward   : {t_fwd:7.3f} ms")
    print(f"decode    : {t_dec:7.3f} ms")
    print(f"nms       : {t_nms:7.3f} ms")
    print(f"sum       : {t_lb+t_fwd+t_dec+t_nms:7.3f} ms")
    print(f"fused     : {t_all:7.3f} ms  -> {BATCH/t_all*1000:8.0f} img/s")


if __name__ == "__main__":
    main()
