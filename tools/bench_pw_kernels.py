#!/usr/bin/env python
"""Micro-bench: pointwise-conv formulations for tiny channel counts.

The yolo-fastest body is dominated by 1x1 convs with Cin/Cout in 8..224 —
K,N far below the 128x128 MXU. Candidates:
  A. XLA conv_general_dilated NHWC (the current path)
  B. Pallas dot, channels-last 2D:  (S, Cin) @ (Cin, Cout)
  C. Pallas dot, K-packed block-diagonal: 16 samples share one K=128 pass
  D. XLA dot on the same 2D shapes (fusion-free baseline)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, W, CIN, COUT = 256, 80, 80, 8, 32
S = N * H * W
PACK = 128 // CIN


def t(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(30):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 30 * 1000


def main():
    rng = np.random.RandomState(0)
    x4 = jnp.asarray(rng.randn(N, H, W, CIN).astype(np.float32), jnp.bfloat16)
    x2 = x4.reshape(S, CIN)
    w = jnp.asarray(rng.randn(CIN, COUT).astype(np.float32) * 0.2, jnp.bfloat16)

    # A: XLA conv
    fa = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w[None, None], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    print("A xla conv      %7.3f ms" % t(fa, x4, w))

    # D: XLA 2D dot
    fd = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32))
    print("D xla dot 2d    %7.3f ms" % t(fd, x2, w))

    # B: Pallas 2D dot, grid over rows
    ROWS = 2048
    def kb(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32)
    fb = jax.jit(lambda x, w: pl.pallas_call(
        kb,
        grid=(S // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, CIN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CIN, COUT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, COUT), jnp.float32),
    )(x, w))
    print("B pallas 2d     %7.3f ms" % t(fb, x2, w))

    # C: Pallas K-packed block-diag: rows of 128 = 16 samples x 8 ch
    xp = x2.reshape(S // PACK, PACK * CIN)
    wblk = np.zeros((PACK * CIN, PACK * COUT), np.float32)
    wn = np.asarray(w, np.float32)
    for p in range(PACK):
        wblk[p * CIN:(p + 1) * CIN, p * COUT:(p + 1) * COUT] = wn
    wb = jnp.asarray(wblk, jnp.bfloat16)
    ROWSP = 1024
    def kc(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32)
    fc = jax.jit(lambda x, w: pl.pallas_call(
        kc,
        grid=((S // PACK) // ROWSP,),
        in_specs=[pl.BlockSpec((ROWSP, PACK * CIN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((PACK * CIN, PACK * COUT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWSP, PACK * COUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S // PACK, PACK * COUT), jnp.float32),
    )(x, w))
    print("C pallas packed %7.3f ms" % t(fc, xp, wb))

    # correctness spot-check C vs D
    rc = np.asarray(fc(xp, wb)).reshape(S, COUT)
    rd = np.asarray(fd(x2, w))
    print("C maxdiff vs D: %.5f" % np.max(np.abs(rc - rd)))


if __name__ == "__main__":
    main()
